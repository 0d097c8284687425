"""Wave-160: sketch semantics — KMV estimate accuracy, AMS F2 estimator
sanity, Bloom no-false-negative invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_accuracy(spark):
    rows = {r["event_type"]: r for r in QUERIES["agg_kmv_distinct"](spark, SF).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        r = rows[et]
        if r["n_kept"] < 64:
            assert r["est_distinct"] == n  # lossless below K
        else:
            # KMV relative error ~ 1/sqrt(K) = 12.5%; allow 3 sigma
            assert abs(r["est_distinct"] - n) <= 0.375 * n, (et, r["est_distinct"], n)


def test_ams_f2_estimator_sanity(spark):
    rows = QUERIES["agg_ams_f2"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["f2_exact"] > 0
        # 16 replicates: std of the mean ~ sqrt(2/16)*F2; allow 3 sigma ~ 1.06*F2
        assert abs(r["f2_est"] - r["f2_exact"]) <= 1.1 * r["f2_exact"]


def test_bloom_never_false_negative(spark):
    rows = QUERIES["agg_bloom_membership"](spark, SF).collect()
    assert rows
    members = [r for r in rows if r["actually_present"]]
    assert members
    for r in members:
        assert r["in_bloom"] is True  # the Bloom invariant
    for r in rows:
        assert r["is_false_positive"] == (r["in_bloom"] and not r["actually_present"])
