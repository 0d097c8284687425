"""Wave-171: RDD placebo check + numpy parity; TOST identities."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_rdd_matches_numpy_and_placebo_small(spark):
    r = QUERIES["events_regression_discontinuity"](spark, SF).collect()[0]
    ids = [x["user_id"] for x in table(spark, SF, "events").select("user_id").collect()]
    cut = (min(ids) + max(ids)) / 2.0
    bw = (max(ids) - min(ids)) / 4.0
    assert abs(r["cutoff"] - round(cut, 2)) < 1e-9
    rows = (
        table(spark, SF, "events")
        .where((F.col("user_id") >= cut - bw) & (F.col("user_id") < cut + bw))
        .select("user_id", "value")
        .collect()
    )
    left = [(x["user_id"], x["value"]) for x in rows if x["user_id"] < cut]
    right = [(x["user_id"], x["value"]) for x in rows if x["user_id"] >= cut]
    assert r["n_l"] == len(left) and r["n_r"] == len(right)

    def fit_at_cut(pts):
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        b1, b0 = np.polyfit(xs, ys, 1)
        return b0 + b1 * cut

    assert abs(r["limit_left"] - fit_at_cut(left)) < 1e-3
    assert abs(r["limit_right"] - fit_at_cut(right)) < 1e-3
    # no discontinuity is planted at user_id=500: placebo effect is small
    scale = np.mean([abs(p[1]) for p in left + right])
    assert abs(r["rd_effect"]) < 2 * scale


def test_tost_identities(spark):
    r = QUERIES["agg_tost_equivalence"](spark, SF).collect()[0]
    assert abs(r["t_lower"] - round((r["mean_diff"] + 0.05) / r["se"], 4)) < 1e-2
    assert abs(r["t_upper"] - round((0.05 - r["mean_diff"]) / r["se"], 4)) < 1e-2
    both = r["t_lower"] > 1.6448536269514722 and r["t_upper"] > 1.6448536269514722
    assert r["equivalent"] == both
