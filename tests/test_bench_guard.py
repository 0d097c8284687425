"""Per-query bench regression guard.

Compares the most recent local bench run (BENCH_LATEST.json, written by
bench.py) against the committed baseline (BENCH_BASELINE.json = per-query
best across driver rounds, ALL 59 headline queries since r9). Skips cleanly
when no local bench run exists (CI or a fresh clone).

MIN-OF-REPS + DRIFT NORMALIZATION (r9): four consecutive rounds of interleaved A/B
(r6 ingest, r7 ingest, r8 ingest, r9 sim_mmd_poly — BENCH_SCALE.md) pinned
every outsized round-over-round move on box contention, which inflates ALL
queries by a common factor (1.13x-1.48x median observed). Comparing each
query's ratio-to-baseline against an absolute 1.5x band therefore fires on
the environment, not the code. The guard now flags a query only when its
ratio exceeds REGRESSION_FACTOR x the MEDIAN ratio across all pinned
queries (floored at 1.0 so a fast box never loosens the band): uniform
drift cancels, while a single query regressing against its peers — the
actual plan-regression signature — still fails loudly. Box-load context
recorded by bench.py is printed on failure so the run is self-explaining.
"""

from __future__ import annotations

import json
import statistics
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
    latest = detail["min"]
    ratios = {
        name: latest[name] / base_sec
        for name, base_sec in baseline.items()
        if name in latest and base_sec >= MIN_BASELINE_SEC
    }
    assert ratios, "no comparable queries between BENCH_LATEST and baseline"
    drift = max(1.0, statistics.median(ratios.values()))
    band = REGRESSION_FACTOR * drift
    regressions = [
        f"{name}: {baseline[name]:.2f}s -> {latest[name]:.2f}s "
        f"({r:.2f}x vs {drift:.2f}x median drift)"
        for name, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r > band
    ]
    load = {k: detail.get(k) for k in ("load_start", "load_end") if detail.get(k)}
    assert not regressions, (
        f"bench regressions vs BENCH_BASELINE.json (band {band:.2f}x = "
        f"{REGRESSION_FACTOR} x {drift:.2f}x median drift):\n"
        + "\n".join(regressions)
        + f"\nbench-run box load: {json.dumps(load)}"
    )
