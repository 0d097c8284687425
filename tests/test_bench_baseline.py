"""Baseline-pin provenance audit (VERDICT r10 item 4).

BENCH_BASELINE.json is the bench guard's ratchet; every pin must be
reproducible from committed certified artifacts, not archaeology. This
test recomputes the whole baseline with tools/pin_baseline.py's builder
and asserts the committed file matches — value, source, and the def_sha
of the pinned query's current implementation. A mismatch means either a
pin was hand-edited (revert it), a new certification run was committed
without regenerating (run: python tools/pin_baseline.py --write), or a
pinned query's implementation changed since pinning (regenerate, so the
provenance records the rework).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from pin_baseline import build_baseline  # noqa: E402


def test_baseline_matches_certified_artifacts():
    committed = json.loads((ROOT / "BENCH_BASELINE.json").read_text())
    rebuilt = build_baseline()
    mismatches = []
    for name, sec in rebuilt["queries"].items():
        got = committed["queries"].get(name)
        if got != sec:
            mismatches.append(f"{name}: committed {got} != certified-min {sec}")
    for name in set(committed["queries"]) - set(rebuilt["queries"]):
        mismatches.append(f"{name}: pinned but reproducible from NO certified artifact")
    assert not mismatches, (
        "BENCH_BASELINE.json drifted from the committed certified artifacts "
        "— regenerate with: python tools/pin_baseline.py --write\n"
        + "\n".join(mismatches)
    )


def test_every_pin_has_provenance():
    committed = json.loads((ROOT / "BENCH_BASELINE.json").read_text())
    prov = committed.get("provenance", {})
    missing = [n for n in committed["queries"] if n not in prov]
    assert not missing, f"pins without provenance: {missing}"
    unsourced = [n for n, p in prov.items() if not p.get("source")]
    assert not unsourced, f"pins with empty source: {unsourced}"


def test_pinned_query_definitions_unchanged_since_pinning():
    committed = json.loads((ROOT / "BENCH_BASELINE.json").read_text())
    rebuilt = build_baseline()
    stale = [
        f"{n}: pinned at def {p.get('def_sha')}, current def "
        f"{rebuilt['provenance'].get(n, {}).get('def_sha')}"
        for n, p in committed.get("provenance", {}).items()
        if n in rebuilt["provenance"]
        and p.get("def_sha") != rebuilt["provenance"][n].get("def_sha")
    ]
    assert not stale, (
        "pinned queries reworked since pinning — regenerate so provenance "
        "records it: python tools/pin_baseline.py --write\n" + "\n".join(stale)
    )
