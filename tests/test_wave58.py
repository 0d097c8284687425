"""Wave-58 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_mixture_divergence_properties(spark):
    r = QUERIES["pipeline_mixture_divergence"](spark, SF_SMALL).first()
    assert r.n_sources == 20
    # KL is non-negative; JS is bounded by ln(2) and symmetric-by-construction
    assert r.kl_pq >= 0 and r.kl_qp >= 0
    assert 0 <= r.js_divergence <= 0.6931472
    # JS is never larger than the average of the two KLs
    assert r.js_divergence <= (r.kl_pq + r.kl_qp) / 2 + 1e-9


def test_cuped_reduces_variance_without_breaking_lift(spark):
    r = QUERIES["events_uplift_cuped"](spark, SF_SMALL).first()
    n_users = (
        table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert r.n_users == n_users
    # pre- and post-period revenue correlate positively for active users
    assert r.theta > 0
    # CUPED must not inflate variance (equality only if theta were 0)
    assert r.var_reduction >= 0
    assert r.var_reduction < 1


def test_sequence_regex_counts_are_consistent(spark):
    rows = QUERIES["events_sequence_regex"](spark, SF_SMALL).collect()
    assert rows
    e = table(spark, SF_SMALL, "events")
    n_per_user = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    err_per_user = {
        r.user_id: r.n
        for r in e.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.journey_len == n_per_user[r.user_id]
        assert r.n_errors == err_per_user.get(r.user_id, 0)
        assert r.converted == (r.n_conversions > 0)
        # a conversion consumes at least a 'v' and a 'p'
        assert 2 * r.n_conversions <= r.journey_len
