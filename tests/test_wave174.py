"""Wave-174: Krippendorff alpha identities; entropy-rate bounds; rule
metric identities vs brute force."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_krippendorff_alpha_bounds_and_identity(spark):
    r = QUERIES["agg_krippendorff_alpha"](spark, SF).collect()[0]
    assert r["n_paired"] > 0
    assert 0 <= r["d_observed"] <= 1
    assert 0 < r["d_expected"] <= 1
    assert abs(r["alpha"] - round(1 - r["d_observed"] / r["d_expected"], 4)) < 1e-3
    assert r["alpha"] <= 1


def test_entropy_rate_bounds(spark):
    r = QUERIES["events_markov_entropy_rate"](spark, SF).collect()[0]
    # conditional entropy cannot exceed the uniform iid ceiling ln(k)
    assert 0 <= r["entropy_rate_nats"] <= r["max_entropy_nats"] + 1e-9
    assert abs(r["max_entropy_nats"] - math.log(r["n_states"])) < 1e-6


def test_rule_metrics_identities(spark):
    rows = QUERIES["basket_rule_metrics"](spark, SF).collect()
    assert len(rows) == 15
    baskets = (
        table(spark, SF, "lineitem")
        .select("l_orderkey", (F.col("l_partkey") % 50).alias("item"))
        .distinct()
        .collect()
    )
    by_basket = defaultdict(set)
    item_s = defaultdict(int)
    for r in baskets:
        by_basket[r["l_orderkey"]].add(r["item"])
        item_s[r["item"]] += 1
    n = len(by_basket)
    prev_lift = None
    for r in rows:
        s_ab = sum(1 for items in by_basket.values() if r["ante"] in items and r["cons"] in items)
        assert r["s_ab"] == s_ab
        conf = s_ab / item_s[r["ante"]]
        lift = conf / (item_s[r["cons"]] / n)
        assert abs(r["confidence"] - conf) < 1e-6
        assert abs(r["lift"] - lift) < 1e-5
        if r["conviction"] is not None:
            assert r["conviction"] > 0
        if prev_lift is not None:
            assert r["lift"] <= prev_lift + 1e-9  # rank order by lift
        prev_lift = r["lift"]
