"""Driver-window planner (VERDICT r9 item 6).

Emits WINDOW_PLAN.json: the realized 50-query driver window for THIS round
(the first 50 names the registry registers, which is what the external
correctness tooling samples) plus the planned future blocks — the
never-yet-driver-checked tail chunked into 50-name windows in registry
order. Window disjointness across rounds is then verifiable by diffing the
committed artifact instead of re-deriving it from git archaeology;
tests/test_window_plan.py asserts the live front-50 matches the artifact
and overlaps no prior round's CORRECTNESS names.

Usage: python tools/window_plan.py [--round 10] [--write]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

WINDOW = 50


def checked_names() -> set[str]:
    """Union of every committed driver-window artifact's query names."""
    names: set[str] = set()
    for p in sorted(ROOT.glob("CORRECTNESS_r[0-9][0-9].json")):
        names |= set(json.loads(p.read_text()))
    return names


def build_plan(current_round: int) -> dict:
    sys.path.insert(0, str(ROOT))
    from data_ingestor_web_app_spark import registry

    registry.load_all()
    order = list(registry.QUERIES)
    prior = checked_names()
    front = order[:WINDOW]
    plan = {f"r{current_round}": front}
    tail = [n for n in order[WINDOW:] if n not in prior and n not in set(front)]
    r = current_round + 1
    for i in range(0, len(tail), WINDOW):
        plan[f"r{r}"] = tail[i : i + WINDOW]
        r += 1
    return {
        "window_size": WINDOW,
        "registry_total": len(order),
        "prior_checked": len(prior),
        "windows": plan,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=10)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    plan = build_plan(args.round)
    out = json.dumps(plan, indent=1)
    if args.write:
        (ROOT / "WINDOW_PLAN.json").write_text(out + "\n")
        print(
            f"wrote WINDOW_PLAN.json: {len(plan['windows'])} windows, "
            f"{sum(len(v) for v in plan['windows'].values())} planned names"
        )
    else:
        print(out)


if __name__ == "__main__":
    main()
