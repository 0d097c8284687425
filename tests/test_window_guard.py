"""Registry-wide unpartitioned-window plan guard (VERDICT r7 item 4).

204 ``Window.orderBy`` sites run without ``partitionBy``.  Individually each
is justified by a "Scale shape" docstring (the window input is an aggregated
/ distinct / limited frame), but nothing *enforced* that those justifications
stay true.  This guard executes every registered batch query's optimizer and
asserts: **no unpartitioned Window whose subtree reaches a raw-scan leaf
(parquet Relation / LogicalRDD) without passing through an Aggregate /
Deduplicate / GlobalLimit** — the plan shape that becomes a single
corpus-sized partition at 100 TB.

Queries that genuinely need a global order over raw rows are enumerated in
``ALLOWED`` with the documented bound that keeps them safe (same enforcement
pattern as tests/test_output_types_guard.py: the exemption is explicit,
reviewed, and any NEW offender fails the suite).
"""

from __future__ import annotations

from data_ingestor_web_app_spark.plans.window_audit import audit_plan
from data_ingestor_web_app_spark.registry import QUERIES

# Streaming/sink builders replay real streams; their per-microbatch plans are
# audited by their own pytest files, and their post-hoc windows run on
# memory-sink snapshot frames bounded by emission counts.
_SKIP_PREFIXES = ("stream_", "sink_")

# name -> documented bound for the global window over raw rows.
# Every entry is a deliberate, reviewed exemption; remove the entry when the
# query is reworked (aggregate-collapse / range-partitioned prefix sums).
ALLOWED: dict[str, str] = {
    # Sequential recursions replayed over the time-ordered event stream: the
    # batch query IS the deterministic replay twin of a streaming operator
    # (O(1) state per step); at 100 TB this runs as the streaming leg, and
    # the batch twin is calendar-bounded by construction.
    "events_lindley_queue": "Lindley prefix recursion over time-ordered arrivals",
    "events_lindley_departures": "Lindley departure smoothing, same replay",
    "events_jackson_tandem": "tandem-queue replay over time-ordered arrivals",
    "events_bandit_replay_greedy": "bandit replay is sequential by definition",
    "events_inspection_paradox": "interarrival gaps need the global arrival order",
    "events_ww_runs_two_sample": "runs test needs the merged sample's global order",
    # Global rank / EDF over a raw fact table: candidates for the
    # aggregate-collapse rework (distinct-value cumulative counts); until
    # then the bound is the fixture/fact-table size and the documented
    # range-partitioned-sort posture in each docstring.
    "agg_watson_u2": "EDF statistic over distinct values; collapse pending",
    "agg_spearman_rho": "double rank over paired columns; collapse pending",
    "agg_l_moments": "L-moment weights are rank polynomials; collapse pending",
    "agg_kruskal_wallis": "rank-sum over pooled sample; collapse pending",
    "agg_cliffs_delta": "rank-based dominance; collapse pending",
    "model_weibull_plot_fit": "median-rank plot needs failure-order ranks",
    "model_quantile_normalization": "rank-to-quantile map; collapse pending",
    "model_qini_uplift": "uplift curve walks the score-sorted population",
    "model_mcc_score": "threshold sweep walks the score-sorted population",
    "model_gains_table": "gains deciles walk the score-sorted population",
    "model_conformal_interval": "conformal quantile is an order statistic",
    "model_duane_growth": "cumulative MTBF walks failures in time order",
    "model_aic_bic_ladder": "ladder ranks a handful of models by score",
    "opt_fractional_knapsack": "greedy walks items by density; top-k shaped",
}


def test_no_global_window_over_raw_scan(spark, sf_small):
    offenders: list[str] = []
    errors: list[str] = []
    stale_allow = set(ALLOWED)
    for name in sorted(QUERIES):
        if name.startswith(_SKIP_PREFIXES):
            continue
        try:
            df = QUERIES[name](spark, sf_small)
            tree = df._jdf.queryExecution().optimizedPlan().treeString()
        except Exception as exc:  # noqa: BLE001 — surface, don't crash the loop
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        viol = audit_plan(tree)
        if not viol:
            continue
        if name in ALLOWED:
            stale_allow.discard(name)
            continue
        v = viol[0]
        offenders.append(f"{name}:\n  {v.window_line[:140]}\n  {v.leaf_line[:100]}")
    assert not errors, "query build errors:\n" + "\n".join(errors)
    assert not offenders, (
        "unpartitioned Window over a raw scan with no Aggregate/Deduplicate/"
        "GlobalLimit between them — a corpus-sized single partition at scale. "
        "Collapse to distinct values first (groupBy + cumulative counts) or "
        "add a reviewed ALLOWED entry with the documented bound:\n"
        + "\n".join(offenders)
    )
    assert not stale_allow, (
        f"stale ALLOWED entries (query no longer trips the audit — remove): "
        f"{sorted(stale_allow)}"
    )
