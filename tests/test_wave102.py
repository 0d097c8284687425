"""Wave-102 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_negbin_mom_identities(spark):
    r = QUERIES["model_negbin_mom"](spark, SF_SMALL).first()
    counts = [
        row.k
        for row in table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("k"))
        .collect()
    ]
    mu, var = np.mean(counts), np.var(counts)
    assert r.n_users == len(counts)
    assert abs(r.mean_purchases - mu) < 1e-3
    assert abs(r.var_purchases - var) < 1e-3
    assert abs(r.dispersion_ratio - var / mu) < 1e-4
    if var > mu:
        # NB mean identity: r(1-p)/p = mu
        assert abs(r.nb_r * (1 - r.nb_p) / r.nb_p - mu) < 0.05
    else:
        assert r.nb_r is None and r.nb_p is None


def test_l_moments_match_bruteforce(spark):
    r = QUERIES["agg_l_moments"](spark, SF_SMALL).first()
    x = np.sort(
        np.array(
            [
                round(row.o_totalprice * 100)
                for row in table(spark, SF_SMALL, "orders").collect()
            ],
            dtype=float,
        )
    )
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = ((i - 1) * x).sum() / (n * (n - 1))
    b2 = ((i - 1) * (i - 2) * x).sum() / (n * (n - 1) * (n - 2))
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    assert r.n == n
    assert abs(r.l1_mean - b0 / 100) < 0.02
    assert abs(r.l2_scale - l2 / 100) < 0.02
    assert abs(r.l_skewness - l3 / l2) < 1e-4
    # L-scale of positive data is below the mean; L-CV in (0,1)
    assert 0 < r.l_cv < 1


def test_ljung_box_matches_formula(spark):
    r = QUERIES["agg_ljung_box"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .collect()
    )
    x = np.array([row.x for row in daily], dtype=float)
    dev = x - x.mean()
    n = len(x)
    c0 = (dev * dev).sum()
    q = 0.0
    for k in range(1, 8):
        rk = (dev[k:] * dev[:-k]).sum() / c0
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert r.n_days == n
    assert abs(r.ljung_box_q - q) < 1e-3
    assert r.reject_whiteness == (q > 14.067140)
