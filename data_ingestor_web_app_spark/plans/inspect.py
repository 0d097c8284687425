"""Physical-plan inspection helpers.

Used by the plan-regression tests (tests/test_scale_plans.py) and by
tools/dump_plans.py to publish the executed plans for review. The interesting
properties at 100 TB are all visible in the plan string:
- `PushedFilters: [...]` / `ReadSchema:` — scan-level predicate pushdown and
  column pruning
- `BroadcastHashJoin` vs `SortMergeJoin` — dimension joins must broadcast
- `*(n)` prefixes — whole-stage-codegen spans (JVM, no Python boundary)
- `HashAggregate` twice — map-side partial aggregation before the exchange
- `TakeOrderedAndProject` / `WindowGroupLimit` — top-k without global sorts
- `AQEShuffleRead` — adaptive coalescing/skew-splitting applied at runtime
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def final_plan(df: DataFrame, materialize: bool = True) -> str:
    """The executed physical plan string. With AQE on, the adaptive plan is
    only final after execution — `materialize` runs the query first (a
    collect on the same plan object; count() would compile a sibling plan
    and leave this one unfinalized)."""
    if materialize:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def plan_properties(plan: str) -> dict[str, bool]:
    """Boolean fingerprint of the scale-relevant plan features."""
    return {
        "pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        "shuffled_hash_join": "ShuffledHashJoin" in plan,
        "cartesian": "CartesianProduct" in plan,
        "codegen": "*(1)" in plan,
        "partial_agg": plan.count("HashAggregate") >= 2,
        "topk_heap": "TakeOrderedAndProject" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "aqe_shuffle_read": "AQEShuffleRead" in plan,
        "python_boundary": "ArrowEvalPython" in plan
        or "FlatMapGroupsInPandas" in plan
        or "MapInPandas" in plan
        or "BatchEvalPython" in plan,
    }
