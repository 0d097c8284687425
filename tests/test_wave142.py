"""Wave-142: distribute/sort plan shape; pinball optimality."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_distribute_sort_by_plan_shape(spark):
    df = QUERIES["sql_distribute_sort_by"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_custkey" in plan
    # SORT BY = partition-local sort: the Sort operator is non-global
    assert "Sort [o_custkey" in plan and "false, 0" in plan


def test_pinball_loss_minimized_at_the_fractile(spark):
    rows = {r["event_type"]: r for r in QUERIES["model_pinball_loss"](spark, SF).collect()}
    per = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("d"))
        .collect()
    ):
        per[r["event_type"]].append(r["d"])

    def loss10(f, ds):
        return sum(9 * (d - f) if d >= f else 1 * (f - d) for d in ds)

    for et, ds in per.items():
        r = rows[et]
        assert r["loss10"] == loss10(r["forecast"], ds)
        # the 0.9 order statistic minimizes pinball loss: nudging the
        # forecast by +-1 cannot do better
        assert loss10(r["forecast"], ds) <= loss10(r["forecast"] + 1, ds)
        assert loss10(r["forecast"], ds) <= loss10(r["forecast"] - 1, ds)
