"""Wave-55 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_cumulative_unique_ends_at_total_distinct(spark):
    rows = sorted(
        QUERIES["events_cumulative_unique"](spark, SF_SMALL).collect(),
        key=lambda r: r.d,
    )
    total = (
        table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert rows[-1].cum_users == total
    # monotone non-decreasing, and the running sum telescopes new_users
    acc = 0
    for r in rows:
        acc += r.new_users
        assert r.cum_users == acc


def test_theil_sen_slope_within_pair_extremes(spark):
    row = QUERIES["agg_theil_sen"](spark, SF_SMALL).first()
    assert row.n_pairs == row.n_months * (row.n_months - 1) // 2
    assert row.min_slope <= row.theil_sen_slope <= row.max_slope


def test_l_diversity_partitions_all_orders(spark):
    rows = QUERIES["privacy_l_diversity"](spark, SF_SMALL).collect()
    n_orders = table(spark, SF_SMALL, "orders").count()
    assert sum(r.n_rows for r in rows) == n_orders
    assert {r.verdict for r in rows} <= {"k_violation", "l_violation", "ok"}
    for r in rows:
        assert 1 <= r.min_l <= r.max_l <= 5


def test_contamination_fraction_bounds_and_verdict(spark):
    rows = QUERIES["pipeline_contamination_fraction"](spark, SF_SMALL).collect()
    assert rows, "dup-dense fixture must surface overlapping docs"
    for r in rows:
        assert r.doc_id % 10 != 0  # eval docs never scored
        assert 0 < r.n_overlap <= r.n_grams
        assert 0 < r.contamination <= 1
        assert r.verdict == ("drop" if r.n_overlap * 4 >= r.n_grams else "keep")


def test_bot_score_cadence_matches_cv(spark):
    rows = QUERIES["events_bot_score"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.gap_cv >= 0 and r.rate_per_min > 0
        if r.gap_cv < 0.9:
            assert r.cadence == "metronomic"
        elif r.gap_cv > 1.05:
            assert r.cadence == "bursty"
        else:
            assert r.cadence == "organic"
    # fixture arrivals are Poisson-ish: the organic band must be populated
    assert any(r.cadence == "organic" for r in rows)


def test_ttr_buckets_cover_all_docs(spark):
    rows = QUERIES["text_ttr_buckets"](spark, SF_SMALL).collect()
    n_docs = table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 < r.min_ttr <= r.avg_ttr <= 1
        assert 32 * r.len_bucket <= r.min_tok <= r.max_tok < 32 * (r.len_bucket + 1)
