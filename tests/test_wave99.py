"""Wave-99 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_gbm_sse_ladder_and_round1_optimality(spark):
    r = QUERIES["model_gbm_two_rounds"](spark, SF_SMALL).first()
    # SSE must be non-increasing over boosting rounds
    assert r.sse0_e10 >= r.sse1_e10 >= r.sse2_e10 > 0
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .toPandas()
    )
    y = pdf["y"].to_numpy(dtype=float)
    # brute-force the round-1 split
    best_t, best_sse = None, float("inf")
    for t in sorted(pdf["q"].unique())[:-1]:
        left = y[pdf["q"] <= t]
        right = y[pdf["q"] > t]
        sse = ((left - left.mean()) ** 2).sum() + ((right - right.mean()) ** 2).sum()
        if sse < best_sse - 1e-6:
            best_sse, best_t = sse, t
    assert r.t1 == best_t
    assert abs(r.sse1_e10 - best_sse / 1e10) < 1e-3
    left = y[pdf["q"] <= best_t]
    right = y[pdf["q"] > best_t]
    assert abs(r.mean_left1 - left.mean() / 100) < 0.02
    assert abs(r.mean_right1 - right.mean() / 100) < 0.02


def test_rmst_consistent_with_km(spark):
    r = QUERIES["events_rmst"](spark, SF_SMALL).first()
    km = {row.k: row.km_survival for row in QUERIES["events_kaplan_meier"](spark, SF_SMALL).collect()}
    assert abs(r.survival_at_10 - km[10]) < 1e-5
    expect = 1.0 + sum(km[k] for k in range(1, 10))
    assert abs(r.rmst_10d - expect) < 1e-4
    assert 0 <= r.rmst_10d <= 10


def test_lang_balance_temperature_flattens(spark):
    rows = QUERIES["pipeline_lang_balance"](spark, SF_SMALL).collect()
    assert abs(sum(r.raw_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        # sqrt temperature moves every share toward uniform
        uniform = 1.0 / len(rows)
        assert (
            min(r.raw_share, uniform) - 1e-9
            <= r.temp_share
            <= max(r.raw_share, uniform) + 1e-9
        )
        # sampling factor >1 exactly for under-represented languages
        assert (r.sampling_factor > 1) == (r.raw_share < uniform) or abs(
            r.raw_share - uniform
        ) < 1e-6
