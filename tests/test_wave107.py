"""Wave-107 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_kde_matches_numpy(spark):
    rows = QUERIES["model_kde_grid"](spark, SF_SMALL).collect()
    assert len(rows) == 21
    x = np.array(
        [round(r.o_totalprice) for r in table(spark, SF_SMALL, "orders").collect()],
        dtype=np.int64,
    )
    h = 50000
    for r in rows:
        u = (x - r.grid_point) / h
        k = 0.75 * np.maximum(0.0, 1 - u * u)
        density = k.sum() / (len(x) * h)
        assert abs(r.density_e6 - density * 1e6) < 1e-3
    # density integrates to ~1 over the grid (trapezoid, coarse)
    dens = np.array([r.density_e6 for r in rows]) / 1e6
    integral = np.trapz(dens, dx=25000)
    assert 0.7 < integral < 1.2


def test_grubbs_flags_most_extreme(spark):
    r = QUERIES["agg_grubbs_test"](spark, SF_SMALL).first()
    pdf = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice").toPandas()
    cents = (pdf["o_totalprice"] * 100).round().astype(np.int64)
    mu, sd = cents.mean(), cents.std(ddof=1)
    g = ((cents - mu).abs() / sd).max()
    assert abs(r.grubbs_g - g) < 1e-4
    idx = ((cents - mu).abs()).idxmax()
    assert r.suspect_orderkey == pdf.loc[idx, "o_orderkey"]
    assert r.reject_as_outlier == (g > 4.0)


def test_seasonality_strength_shares_sum(spark):
    r = QUERIES["events_seasonality_strength"](spark, SF_SMALL).first()
    assert abs(r.seasonality_strength + r.residual_share - 1.0) < 1e-5
    assert 0 <= r.seasonality_strength <= 1
    # cross-check against the ANOVA decomposition in pandas
    pdf = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .toPandas()
    )
    pdf["dow"] = pdf["day"].map(lambda d: d.isoweekday())
    sst = ((pdf["x"] - pdf["x"].mean()) ** 2).sum()
    ssb = sum(
        len(g) * (g["x"].mean() - pdf["x"].mean()) ** 2 for _, g in pdf.groupby("dow")
    )
    assert abs(r.seasonality_strength - ssb / sst) < 1e-4
