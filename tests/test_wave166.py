"""Wave-166: LP optimum vs scipy-free brute force; Weiszfeld contraction;
Gumbel L-moment identities."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_lp_vertex_matches_bruteforce(spark):
    got = QUERIES["opt_lp_vertex_2var"](spark, SF).collect()
    assert len(got) == 1
    r = got[0]
    cons = [
        (row["a"], row["b"], row["c"])
        for row in table(spark, SF, "part")
        .groupBy("p_brand")
        .agg(
            F.round(F.avg("p_size"), 2).alias("a"),
            F.round(F.avg("p_retailprice") / 100, 2).alias("b"),
            F.round(F.sum("p_size") * F.lit(1.0), 2).alias("c"),
        )
        .collect()
    ]
    lines = cons + [(0.0, 1.0, 0.0), (1.0, 0.0, 0.0)]
    best = None
    for (a1, b1, c1), (a2, b2, c2) in combinations(lines, 2):
        det = a1 * b2 - a2 * b1
        if det == 0:
            continue
        x = (c1 * b2 - c2 * b1) / det
        y = (a1 * c2 - a2 * c1) / det
        if x < -1e-9 or y < -1e-9:
            continue
        if any(ka * x + kb * y > kc + 1e-6 for ka, kb, kc in cons):
            continue
        obj = 5 * x + 4 * y
        if best is None or obj > best:
            best = obj
    assert best is not None
    assert abs(r["objective"] - round(best, 4)) < 1e-6
    # optimum satisfies every constraint
    assert all(ka * r["x"] + kb * r["y"] <= kc + 1e-3 for ka, kb, kc in cons)


def test_weiszfeld_reduces_l1_cost(spark):
    r = QUERIES["model_weiszfeld_2step"](spark, SF).collect()[0]
    pts = [
        (row["px"], row["py"])
        for row in table(spark, SF, "lineitem")
        .select(
            (F.col("l_quantity") * 1.0).alias("px"),
            (F.col("l_extendedprice") / 1000).alias("py"),
        )
        .collect()
    ]

    def cost(cx, cy):
        return sum(((px - cx) ** 2 + (py - cy) ** 2) ** 0.5 for px, py in pts)

    # two Weiszfeld steps strictly reduce the L1 objective vs the centroid
    assert cost(r["gmed_x"], r["gmed_y"]) < cost(r["mean_x"], r["mean_y"])


def test_gumbel_lmom_identities(spark):
    r = QUERIES["agg_gumbel_lmom"](spark, SF).collect()[0]
    import math

    assert abs(r["beta_scale"] - r["l2"] / math.log(2)) < 1e-4
    assert abs(r["mu_location"] - (r["l1"] - 0.5772156649015329 * r["beta_scale"])) < 1e-4
    # the 100-day return level must exceed the location (right tail)
    assert r["ret_level_100d"] > r["mu_location"]
    assert r["beta_scale"] > 0
