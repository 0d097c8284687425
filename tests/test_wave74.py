"""Wave-74 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_gumbel_return_levels_order(spark):
    r = QUERIES["events_extreme_value_gumbel"](spark, SF_SMALL).first()
    assert r.gumbel_beta_usd > 0
    # rarer events are bigger, and both exceed the location parameter
    assert r.gumbel_mu_usd < r.return_level_10d_usd < r.return_level_100d_usd
    # return levels stay in the plausible ballpark of observed maxima
    mx = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date"))
        .agg(F.max("value").alias("m"))
        .agg(F.max("m"))
        .first()[0]
    )
    assert r.return_level_100d_usd < mx * 3


def test_exists_flag_partitions_customers(spark):
    rows = QUERIES["join_exists_flag"](spark, SF_SMALL).collect()
    n_customers = table(spark, SF_SMALL, "customer").count()
    assert sum(r.n_customers for r in rows) == n_customers
    assert {r.has_urgent for r in rows} == {True, False}
    # plan check: EXISTS-in-projection compiles to an ExistenceJoin
    df = QUERIES["join_exists_flag"](spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistenceJoin" in plan or "exists" in plan


def test_control_chart_limits_bracket_center(spark):
    r = QUERIES["events_control_chart_imr"](spark, SF_SMALL).first()
    assert r.lcl < r.center < r.ucl
    assert abs((r.ucl - r.center) - 2.66 * r.mr_bar) < 1e-2
    assert 0 <= r.n_violations <= r.n_days
