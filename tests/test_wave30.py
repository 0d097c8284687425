"""Semantic invariants for wave-30 (distribution windows, nonparametric
tests, ACF, snapshot diff, k-core, OLS). Oracle hash-parity runs in
tools/check_oracle.py; these pin the statistics and plan shapes a value
hash can't see."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_distributed_prefix_sum_matches_global_window(spark):
    """The stitched prefix sum must equal the single-partition window
    formulation bit-for-bit — and stay deterministic across evaluations
    (the repartitionByRange double-evaluation race this helper replaces)."""
    from data_ingestor_web_app_spark.operators.wave30 import _distributed_prefix_sum

    e = table(spark, SF_SMALL, "events")
    by_val = e.groupBy("value").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.value: r.cum
        for r in by_val.select("value", F.sum("cnt").over(w).alias("cum")).collect()
    }
    for _ in range(2):  # two evaluations — nondeterminism would flap
        got = {
            r.value: r.cnt_cum
            for r in _distributed_prefix_sum(by_val, "value", ["cnt"]).collect()
        }
        assert got == want


def test_ks_statistic_bounds_and_self_test_zero(spark):
    row = QUERIES["agg_ks_test"](spark, SF_SMALL).first()
    assert 0.0 <= row.ks_d <= 1.0
    assert row.n_a > 0 and row.n_b > 0
    # self-KS must be exactly 0: identical samples have identical ECDFs
    e = table(spark, SF_SMALL, "events").where(F.col("event_type") == "view")
    by_val = e.groupBy("value").agg(F.count("*").cast("long").alias("c"))
    from data_ingestor_web_app_spark.operators.wave30 import _distributed_prefix_sum

    swept = _distributed_prefix_sum(by_val, "value", ["c"])
    tot = by_val.agg(F.sum("c").alias("n")).first().n
    d_self = swept.agg(
        F.max(F.abs(F.col("c_cum") / F.lit(tot) - F.col("c_cum") / F.lit(tot)))
    ).first()[0]
    assert d_self == 0.0


def test_mann_whitney_u_identity(spark):
    """U_a + U_b == n_a * n_b (with average-rank ties this holds exactly)."""
    row = QUERIES["agg_mann_whitney"](spark, SF_SMALL).first()
    u_a = row.u_stat
    # recompute U_b from the rank-sum identity: R_a + R_b = N(N+1)/2
    n = row.n_a + row.n_b
    r_b = n * (n + 1) / 2.0 - row.rank_sum_a
    u_b = r_b - row.n_b * (row.n_b + 1) / 2.0
    assert abs((u_a + u_b) - row.n_a * row.n_b) < 1e-6


def test_autocorrelation_in_range_and_lag0_is_one(spark):
    rows = QUERIES["events_autocorrelation"](spark, SF_SMALL).collect()
    assert {r.lag_k for r in rows} == {1, 2, 3, 4, 5}
    for r in rows:
        if r.acf is not None:
            assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0


def test_snapshot_diff_classes_reconcile(spark):
    rows = {r.change: r for r in QUERIES["snapshot_diff"](spark, SF_SMALL).collect()}
    v1_n = table(spark, SF_SMALL, "orders").count()
    # every v1 key lands in removed/changed/unchanged; added is v2-only
    assert (
        rows["removed"].n + rows["changed"].n + rows["unchanged"].n == v1_n
    )
    assert rows["added"].min_key > 2000000000  # inserted keys are shifted
    assert rows["removed"].n > 0 and rows["changed"].n > 0


def test_kcore_every_member_has_core_degree(spark):
    rows = QUERIES["graph_kcore_unrolled"](spark, SF_SMALL).collect()
    assert rows, "4-core must be non-empty on the variable-fanout graph"
    assert all(r.core_degree >= 4 for r in rows)
    assert len(rows) < 25  # peeling must actually remove something


def test_ols_two_feature_beats_mean_baseline(spark):
    """The fitted plane must not increase SSE vs the intercept-only model
    (OLS optimality), checked by direct residual computation."""
    row = QUERIES["agg_ols_two_feature"](spark, SF_SMALL).first()
    e = table(spark, SF_SMALL, "events")
    pts = e.select(
        F.col("value").alias("y"),
        F.hour("ts").cast("double").alias("x1"),
        (F.dayofweek("ts").cast("double") - 1).alias("x2"),
    )
    pred = F.lit(row.intercept) + F.lit(row.beta1) * F.col("x1") + F.lit(row.beta2) * F.col("x2")
    sse_model = pts.agg(F.sum(F.pow(F.col("y") - pred, 2))).first()[0]
    mean_y = pts.agg(F.avg("y")).first()[0]
    sse_mean = pts.agg(F.sum(F.pow(F.col("y") - F.lit(mean_y), 2))).first()[0]
    assert sse_model <= sse_mean * (1 + 1e-9)


def test_grouping_id_granularities(spark):
    rows = QUERIES["agg_grouping_id"](spark, SF_SMALL).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    # gid 3 = grand total, exactly one row, equal to the sum of gid-0 counts
    assert len(by_gid[3]) == 1
    assert by_gid[3][0].n_orders == sum(r.n_orders for r in by_gid[0])
    # rolled-up columns are masked with the sentinel
    assert all(r.priority == "__all__" for r in by_gid[1])
    assert all(r.status == "__all__" for r in by_gid[2])


def test_rolling_corr_window_is_trailing(spark):
    rows = QUERIES["events_rolling_corr"](spark, SF_SMALL).collect()
    assert all(r.corr_24h is None or -1.0 <= r.corr_24h <= 1.0 for r in rows)
    assert len(rows) == len({r.hour for r in rows})  # one row per hour
