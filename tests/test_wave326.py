"""Wave-326: 2x2 shelf vs a cell replay with the |phi| <= |Y| <= |Q|
ordering; point-biserial vs the pooled two-sample identity."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _units(spark):
    return table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS w",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y",
        "CAST(ROUND(value*1000) AS LONG) AS m",
    ).collect()


def test_yule_shelf_matches_cells_and_ordering(spark):
    row = QUERIES["agg_yule_q_phi"](spark, SF).first()
    us = _units(spark)
    a = sum(1 for u in us if u["w"] and u["y"])
    b = sum(1 for u in us if u["w"] and not u["y"])
    c = sum(1 for u in us if not u["w"] and u["y"])
    d = sum(1 for u in us if not u["w"] and not u["y"])
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    phi = (a * d - b * c) / math.sqrt((a + b) * (c + d) * (a + c) * (b + d))
    q = (a * d - b * c) / (a * d + b * c)
    y = (math.sqrt(a * d) - math.sqrt(b * c)) / (
        math.sqrt(a * d) + math.sqrt(b * c)
    )
    assert abs(row["phi"] - phi) < 1e-6
    assert abs(row["yule_q"] - q) < 1e-6
    assert abs(row["yule_y"] - y) < 1e-6
    # the textbook magnitude ordering
    assert abs(row["phi"]) <= abs(row["yule_y"]) + 1e-9 <= abs(row["yule_q"]) + 2e-9
    # signs agree across the shelf
    assert (row["phi"] >= 0) == (row["yule_q"] >= 0) == (row["yule_y"] >= 0)


def test_point_biserial_matches_pooled_t_identity(spark):
    row = QUERIES["agg_point_biserial"](spark, SF).first()
    us = _units(spark)
    g1 = [u["m"] / 1000 for u in us if u["w"]]
    g0 = [u["m"] / 1000 for u in us if not u["w"]]
    allv = g1 + g0
    n = len(allv)
    m1, m0 = sum(g1) / len(g1), sum(g0) / len(g0)
    mu = sum(allv) / n
    sd = math.sqrt(sum(v * v for v in allv) / n - mu * mu)
    p = len(g1) / n
    r = (m1 - m0) / sd * math.sqrt(p * (1 - p))
    t = r * math.sqrt((n - 2) / (1 - r * r))
    assert row["n_obs"] == n and row["n_weekend"] == len(g1)
    assert abs(row["mean_weekend"] - m1) < 1e-4
    assert abs(row["mean_weekday"] - m0) < 1e-4
    assert abs(row["r_pb"] - r) < 1e-6
    assert abs(row["t_stat"] - t) < 1e-4
    assert -1 < row["r_pb"] < 1
