"""Wave-81 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_assortativity_matches_numpy(spark):
    r = QUERIES["graph_degree_assortativity"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    ds = pdf.groupby("l_suppkey")["l_partkey"].transform("count")
    dp = pdf.groupby("l_partkey")["l_suppkey"].transform("count")
    assert r.n_edges == len(pdf)
    expected = np.corrcoef(ds, dp)[0, 1]
    assert abs(r.assortativity - expected) < 1e-5
    assert -1.0 <= r.assortativity <= 1.0


def test_dbscan_core_matches_bruteforce(spark):
    rows = QUERIES["spatial_dbscan_core"](spark, SF_SMALL).collect()
    pts = {
        r.pid: (r.x, float(r.y))
        for r in table(spark, SF_SMALL, "events")
        .where(F.col("event_id") < 2000)
        .select("event_id", "value", "user_id")
        .withColumnRenamed("event_id", "pid")
        .withColumnRenamed("value", "x")
        .withColumnRenamed("user_id", "y")
        .collect()
    }
    assert len(rows) == len(pts)
    for r in rows[:200]:
        ax, ay = pts[r.pid]
        n = sum(
            1
            for q, (bx, by) in pts.items()
            if q != r.pid and (ax - bx) ** 2 + (ay - by) ** 2 <= 4.0
        )
        assert r.n_neighbors == n
        assert r.is_core == (n >= 4)


def test_decision_stump_beats_parent(spark):
    r = QUERIES["model_decision_stump"](spark, SF_SMALL).first()
    assert r.n_left > 0 and r.n_right > 0
    assert r.gini_gain >= 0
    assert abs((r.parent_gini - r.weighted_gini) - r.gini_gain) < 2e-6
    # exhaustive check against pandas sweep
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
        )
        .toPandas()
    )
    best, best_w = None, float("inf")
    n, pos = len(pdf), pdf["y"].sum()
    for t in sorted(pdf["q"].unique())[:-1]:
        left = pdf[pdf["q"] <= t]["y"]
        right = pdf[pdf["q"] > t]["y"]
        gl = 1 - (left.mean() ** 2 + (1 - left.mean()) ** 2)
        gr = 1 - (right.mean() ** 2 + (1 - right.mean()) ** 2)
        wg = (len(left) * gl + len(right) * gr) / n
        if wg < best_w - 1e-12:
            best, best_w = t, wg
    assert r.threshold == best
    assert abs(r.weighted_gini - best_w) < 1e-5
