"""Wave-376 independent replays: Cox-Stuart by an explicit half-offset
pairing loop; the X̄-R chart by a plain-python subgroup walk with the
STP-15D constants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .orderBy("day")
        .collect()
    )
    return [r["c"] for r in rows]


def test_cox_stuart_pairing_replay(spark):
    cs = _daily(spark)
    n = len(cs)
    h = n // 2
    sp = sm = 0
    for i in range(h):
        a, b = cs[i], cs[i + h]
        if b > a:
            sp += 1
        elif b < a:
            sm += 1
    row = QUERIES["agg_cox_stuart"](spark, SF).collect()[0]
    assert (row["s_plus"], row["s_minus"]) == (sp, sm)
    ne = sp + sm
    assert row["n_eff"] == ne
    assert row["z"] == round((2 * max(sp, sm) - ne) / math.sqrt(ne), 6)
    want = "increasing" if sp > sm else "decreasing" if sm > sp else "none"
    assert row["trend"] == want


def test_xbar_r_subgroup_walk(spark):
    cs = _daily(spark)
    k = len(cs) // 7
    groups = [cs[7 * g : 7 * g + 7] for g in range(k)]
    means = [sum(g) / 7 for g in groups]
    ranges = [max(g) - min(g) for g in groups]
    xbar = sum(sum(g) for g in groups) / (7 * k)
    rbar = sum(ranges) / k
    a2, d3, d4 = 0.419, 0.076, 1.924
    x_ooc = sum(1 for m in means if m > xbar + a2 * rbar or m < xbar - a2 * rbar)
    r_ooc = sum(1 for r in ranges if r > d4 * rbar or r < d3 * rbar)
    row = QUERIES["events_xbar_r_chart"](spark, SF).collect()[0]
    assert row["n_subgroups"] == k
    assert row["xbar_center"] == round(xbar, 4)
    assert row["rbar_center"] == round(rbar, 4)
    assert row["x_ucl"] == round(xbar + a2 * rbar, 4)
    assert row["x_lcl"] == round(xbar - a2 * rbar, 4)
    assert row["r_ucl"] == round(d4 * rbar, 4)
    assert row["r_lcl"] == round(d3 * rbar, 4)
    assert (row["n_xbar_ooc"], row["n_range_ooc"]) == (x_ooc, r_ooc)
    # chart sanity: limits bracket the centers
    assert row["x_lcl"] < row["xbar_center"] < row["x_ucl"]
    assert row["r_lcl"] < row["rbar_center"] < row["r_ucl"]
