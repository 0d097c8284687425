"""Wave-98 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_holt_winters_matches_sequential(spark):
    r = QUERIES["events_holt_winters"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("x"))
        .orderBy("d")
        .collect()
    )
    xs = [float(row.x) for row in daily]
    assert r.n_days == len(xs)
    l, b = xs[0], 0.0
    s = [0.0] + [xs[i] - xs[0] for i in range(1, 7)]
    for x in xs[7:]:
        l_new = 0.5 * (x - s[0]) + 0.5 * (l + b)
        b_new = 0.5 * (l_new - l) + 0.5 * b
        s = s[1:] + [0.5 * (x - l_new) + 0.5 * s[0]]
        l, b = l_new, b_new
    assert abs(r.level - l) < 1e-4
    assert abs(r.trend - b) < 1e-4
    assert abs(r.next_season - s[0]) < 1e-4
    assert abs(r.forecast_next - (l + b + s[0])) < 1e-3


def test_spearman_matches_scipy_style(spark):
    r = QUERIES["agg_spearman_rho"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    rx = pdf["l_quantity"].rank(method="average")
    ry = pdf["l_extendedprice"].rank(method="average")
    rho = np.corrcoef(rx, ry)[0, 1]
    assert abs(r.spearman_rho - rho) < 1e-5
    # synthetic fixture: price is independent of quantity, so rho ~ 0
    assert -1.0 <= r.spearman_rho <= 1.0


def test_cross_field_rules_report(spark):
    rows = {r.rule: r for r in QUERIES["dq_cross_field_rules"](spark, SF_SMALL).collect()}
    assert set(rows) == {
        "discount_out_of_band",
        "nonpositive_price",
        "ship_before_order",
        "order_line_total_gap",
    }
    li = table(spark, SF_SMALL, "lineitem")
    n_lines = li.join(
        table(spark, SF_SMALL, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).count()
    for name in ("discount_out_of_band", "nonpositive_price", "ship_before_order"):
        assert rows[name].n_checked == n_lines
        assert 0 <= rows[name].violation_rate <= 1
    # the fixture has uncorrelated ship dates: violations must exist
    assert rows["ship_before_order"].n_violations > 0
    # discounts and prices are clean in this fixture
    assert rows["discount_out_of_band"].n_violations == 0
    assert rows["nonpositive_price"].n_violations == 0
