"""Per-query bench regression guard.

Compares the most recent local bench run (BENCH_LATEST.json, written by
bench.py) against the committed baseline (BENCH_BASELINE.json = per-query
best across driver rounds). Flags any query whose MEDIAN regressed more
than REGRESSION_FACTOR vs baseline — the round-2 lesson being that n=1
timings swing ±40% on unchanged code, so only median-vs-best with a 1.5x
band is actionable. Skips cleanly when no local bench run exists (CI or a
fresh clone), so the guard costs nothing unless bench.py was run.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
REGRESSION_FACTOR = 1.5
# absolute floor: sub-0.5s queries are scheduler-noise-bound at sf0.1 —
# a 0.2s -> 0.35s move is not a regression signal
MIN_BASELINE_SEC = 0.5


def test_no_per_query_bench_regression():
    latest_p = ROOT / "BENCH_LATEST.json"
    if not latest_p.exists():
        pytest.skip("no local bench run (BENCH_LATEST.json missing)")
    baseline = json.loads((ROOT / "BENCH_BASELINE.json").read_text())["queries"]
    detail = json.loads(latest_p.read_text())
    latest = detail["median"]
    regressions = []
    for name, base_sec in baseline.items():
        got = latest.get(name)
        if got is None or base_sec < MIN_BASELINE_SEC:
            continue
        if got > base_sec * REGRESSION_FACTOR:
            regressions.append(f"{name}: {base_sec:.2f}s -> {got:.2f}s ({got / base_sec:.2f}x)")
    # box-load context recorded by bench.py (VERDICT r8 item 8): printed on
    # failure so an environment-contended run is self-explaining
    load = {k: detail.get(k) for k in ("load_start", "load_end") if detail.get(k)}
    assert not regressions, (
        "bench regressions vs BENCH_BASELINE.json:\n"
        + "\n".join(regressions)
        + f"\nbench-run box load: {json.dumps(load)}"
    )
