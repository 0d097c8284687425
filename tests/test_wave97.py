"""Wave-97 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_gamma_mom_matches_numpy(spark):
    rows = QUERIES["model_gamma_mom"](spark, SF_SMALL).collect()
    pdf = table(spark, SF_SMALL, "orders").select("o_orderpriority", "o_totalprice").toPandas()
    for r in rows:
        x = pdf[pdf.o_orderpriority == r.o_orderpriority]["o_totalprice"].to_numpy()
        mu, var = x.mean(), x.var()
        assert abs(r.mean_price - mu) < 0.02
        assert abs(r.k_shape - mu * mu / var) < 1e-3
        assert abs(r.theta_scale - var / mu) < 0.5
        # k * theta = mean identity
        assert abs(r.k_shape * r.theta_scale - r.mean_price) < 1.0
        assert abs(r.cv - 1 / r.k_shape ** 0.5) < 1e-3


def test_cronbach_alpha_matches_numpy(spark):
    r = QUERIES["agg_cronbach_alpha"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("i1"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("i2"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("i3"),
        )
        .toPandas()
    )
    items = pdf[["i1", "i2", "i3"]].to_numpy(dtype=float)
    v_items = items.var(axis=0).sum()
    v_total = items.sum(axis=1).var()
    alpha = 1.5 * (1 - v_items / v_total)
    assert abs(r.cronbach_alpha - alpha) < 1e-4
    assert r.cronbach_alpha <= 1.0


def test_fleiss_kappa_matches_formula(spark):
    r = QUERIES["agg_fleiss_kappa"](spark, SF_SMALL).first()
    pdf = table(spark, SF_SMALL, "lineitem").select(
        "l_discount", "l_quantity", "l_extendedprice"
    ).toPandas()
    import pandas as pd

    ra = np.where(pdf.l_discount < 0.03, 0, np.where(pdf.l_discount < 0.07, 1, 2))
    rb = np.where(pdf.l_quantity < 17, 0, np.where(pdf.l_quantity < 34, 1, 2))
    rc = np.where(
        pdf.l_extendedprice < 15000, 0, np.where(pdf.l_extendedprice < 40000, 1, 2)
    )
    N = len(pdf)
    counts = np.zeros((N, 3), dtype=int)
    for arr in (ra, rb, rc):
        for c in range(3):
            counts[:, c] += arr == c
    p_i = ((counts ** 2).sum(axis=1) - 3) / 6
    p_bar = p_i.mean()
    p_j = counts.sum(axis=0) / (3 * N)
    p_e = (p_j ** 2).sum()
    kappa = (p_bar - p_e) / (1 - p_e)
    assert abs(r.observed_agreement - p_bar) < 1e-5
    assert abs(r.expected_agreement - p_e) < 1e-5
    assert abs(r.fleiss_kappa - kappa) < 1e-4
    assert -1 <= r.fleiss_kappa <= 1
