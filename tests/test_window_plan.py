"""Driver-window plan invariants (VERDICT r9 item 6).

The external correctness tooling samples the FIRST 50 registered queries
each round. WINDOW_PLAN.json commits the realized current window plus the
planned future blocks, so window disjointness is verifiable by diff. This
test pins three invariants against the LIVE registry:

1. the realized front-50 equals the committed plan's current window —
   catching both registry edits and cross-module import side effects that
   re-order registration (the r10 lesson: wave328 importing a SQL constant
   from wave144 silently pulled three r7-checked names into the window);
2. the current window overlaps NO prior round's CORRECTNESS artifact;
3. all planned windows are pairwise disjoint and cover only names that are
   live in the registry.
"""

from __future__ import annotations

import json
from pathlib import Path

from data_ingestor_web_app_spark.registry import DRIVER_ROUND, QUERIES

ROOT = Path(__file__).resolve().parent.parent

CURRENT_ROUND = DRIVER_ROUND


def _plan() -> dict:
    return json.loads((ROOT / "WINDOW_PLAN.json").read_text())


def test_front_window_matches_committed_plan():
    plan = _plan()
    window = plan["window_size"]
    front = list(QUERIES)[:window]
    assert front == plan["windows"][CURRENT_ROUND], (
        "live registry front window drifted from WINDOW_PLAN.json — "
        "re-run: python tools/window_plan.py --round <N> --write "
        "(and check for cross-module imports registering queries early)"
    )


def test_current_window_never_driver_checked():
    plan = _plan()
    prior: set[str] = set()
    for p in sorted(ROOT.glob("CORRECTNESS_r[0-9][0-9].json")):
        if p.stem.split("_r")[-1] >= CURRENT_ROUND[1:]:
            continue  # only rounds before the current one
        prior |= set(json.loads(p.read_text()))
    overlap = sorted(set(plan["windows"][CURRENT_ROUND]) & prior)
    assert not overlap, f"window re-checks driver-verified names: {overlap}"


def test_planned_windows_disjoint_and_live():
    plan = _plan()
    seen: set[str] = set()
    for rnd, names in plan["windows"].items():
        dup = seen & set(names)
        assert not dup, f"{rnd} overlaps an earlier window: {sorted(dup)[:5]}"
        seen |= set(names)
        dead = [n for n in names if n not in QUERIES]
        assert not dead, f"{rnd} plans unregistered names: {dead[:5]}"
