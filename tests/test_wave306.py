"""Wave-306: bullwhip CV2 ratio vs a two-series python replay; c-chart
limits vs the Poisson identity and a daily walk."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _cv2(xs):
    n = len(xs)
    m = sum(xs) / n
    return (sum(x * x for x in xs) / n - m * m) / (m * m)


def test_bullwhip_matches_two_series_replay(spark):
    row = QUERIES["events_bullwhip"](spark, SF).first()
    demand = Counter(
        r["d"]
        for r in table(spark, SF, "events")
        .where("event_type = 'purchase'")
        .selectExpr("CAST(ts AS DATE) AS d")
        .collect()
    )
    orders = Counter(
        r["o_orderdate"]
        for r in table(spark, SF, "orders").select("o_orderdate").collect()
    )
    cv2_d = _cv2(list(demand.values()))
    cv2_o = _cv2(list(orders.values()))
    assert row["n_demand_days"] == len(demand)
    assert row["n_order_days"] == len(orders)
    assert abs(row["cv2_demand"] - cv2_d) < 1e-6
    assert abs(row["cv2_orders"] - cv2_o) < 1e-6
    assert abs(row["bullwhip_ratio"] - cv2_o / cv2_d) < 1e-5
    assert row["amplifying"] == (cv2_o / cv2_d > 1)


def test_c_chart_matches_daily_walk(spark):
    row = QUERIES["events_c_chart"](spark, SF).first()
    errors = Counter(
        r["d"]
        for r in table(spark, SF, "events")
        .selectExpr("CAST(ts AS DATE) AS d", "event_type")
        .where("event_type = 'error'")
        .collect()
    )
    all_days = {
        r["d"]
        for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    }
    cs = [errors.get(d, 0) for d in all_days]
    cbar = sum(cs) / len(cs)
    ucl = cbar + 3 * math.sqrt(cbar)
    lcl = max(cbar - 3 * math.sqrt(cbar), 0)
    assert row["n_days"] == len(all_days)
    assert abs(row["c_bar"] - cbar) < 1e-6
    assert abs(row["ucl"] - ucl) < 1e-5
    assert abs(row["lcl"] - lcl) < 1e-5
    assert row["n_above_ucl"] == sum(1 for c in cs if c > ucl)
    assert row["n_below_lcl"] == sum(1 for c in cs if c < lcl)
    assert row["max_daily_errors"] == max(cs)
    # Poisson identity: the band is +-3 sqrt(center), symmetric until the
    # floor clips it
    assert abs((row["ucl"] - row["c_bar"]) - 3 * math.sqrt(cbar)) < 1e-5
