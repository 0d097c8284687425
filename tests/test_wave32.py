"""Wave-32 semantic + plan-shape checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_nested_pruning_reads_only_selected_leaves(spark):
    df = QUERIES["scan_nested_pruning"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the parquet scan must prune to the two selected leaves + filter leaf,
    # never the whole struct (segment must NOT be read)
    assert "segment" not in plan, plan[:2000]
    assert "ReadSchema" in plan


def test_gopher_rules_keep_implies_all_rules(spark):
    rows = QUERIES["text_gopher_rules"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        expect = (
            50 <= r.n_words <= 100000
            and 3 <= r.mean_word_len <= 10
            and r.hash_ratio <= 0.1
            and r.ellipsis_ratio <= 0.1
            and r.n_required_stop >= 2
        )
        assert r.keep == expect, r


def test_mixture_temperature_flattens_distribution(spark):
    rows = QUERIES["pipeline_mixture_temperature"](spark, SF_SMALL).collect()
    assert abs(sum(r.p_sampled for r in rows) - 1.0) < 1e-4
    lo = min(rows, key=lambda r: r.p_raw)
    hi = max(rows, key=lambda r: r.p_raw)
    # temperature < 1 up-samples the tail and down-samples the head
    assert lo.upsample_factor >= 1.0 or abs(lo.p_raw - hi.p_raw) < 1e-9
    assert hi.upsample_factor <= 1.0 + 1e-9


def test_merge_actions_matrix(spark):
    out = {r.o_orderkey: r for r in QUERIES["upsert_merge_actions"](spark, SF_SMALL).collect()}
    src_rows = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice").collect()
    base = {r.o_orderkey: r.o_totalprice for r in src_rows}
    for k, price in base.items():
        if k % 2 == 0 and k % 3 == 0:
            assert k not in out  # matched delete
        elif k % 2 == 0:
            assert abs(out[k].o_totalprice - round(price + 500.0, 2)) < 1e-6  # matched update
        elif k % 1000 == 999:
            assert k not in out  # not-matched-by-source delete
        else:
            assert k in out  # untouched
        if k % 100 == 1:
            ins = out[k + 3000000000]  # not-matched insert
            assert ins.o_orderstatus == "N"


def test_anova_f_nonnegative_and_group_count(spark):
    row = QUERIES["agg_anova_oneway"](spark, SF_SMALL).first()
    n_types = table(spark, SF_SMALL, "events").select("event_type").distinct().count()
    assert row.k_groups == n_types
    assert row.f_stat >= 0
    assert row.ms_within > 0


def test_rfm_scores_cover_grid_and_reconcile(spark):
    rows = QUERIES["agg_rfm_segments"](spark, SF_SMALL).collect()
    n_cust = table(spark, SF_SMALL, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
