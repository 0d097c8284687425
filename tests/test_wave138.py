"""Wave-138: permutation-test validity, Western Electric rule sanity."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_permutation_test_pvalue_valid(spark):
    r = QUERIES["agg_permutation_test"](spark, SF).collect()[0]
    assert 0 < r["p_value"] <= 1.0
    assert 0 <= r["n_extreme"] <= 200
    assert abs(r["p_value"] - (r["n_extreme"] + 1) / 201) < 1e-6
    assert r["n_a"] + r["n_b"] >= 2


def test_western_electric_rules_sane(spark):
    rows = QUERIES["events_spc_western_electric"](spark, SF).collect()
    assert rows
    # recompute rule 1 exactly (points beyond 3 sigma, population)
    per = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        per[r["event_type"]].append(r["x"])
    for r in rows:
        xs = per[r["event_type"]]
        n = len(xs)
        mu = sum(xs) / n
        sd = (sum(v * v for v in xs) / n - mu * mu) ** 0.5
        rule1 = sum(1 for v in xs if abs((v - mu) / sd) > 3)
        assert r["rule1_days"] == rule1
        assert r["any_signal_days"] <= n
        # union of signal days >= each rule's own day count, <= their sum
        assert r["any_signal_days"] >= max(
            r["rule1_days"], r["rule2_days"], r["rule3_days"], r["rule4_days"]
        )
        assert r["any_signal_days"] <= (
            r["rule1_days"] + r["rule2_days"] + r["rule3_days"] + r["rule4_days"]
        )
