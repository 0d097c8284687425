"""Wave-163: ridge vs numpy closed form; M/M/1 identities; jackknife vs
python brute-force leave-one-out."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_ridge_matches_numpy(spark):
    r = QUERIES["model_ridge_closed_form"](spark, SF).collect()[0]
    rows = (
        table(spark, SF, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    X = np.array([[x["l_quantity"], x["l_discount"]] for x in rows])
    y = np.array([x["l_extendedprice"] for x in rows])
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    beta = np.linalg.solve(Xc.T @ Xc + 10.0 * np.eye(2), Xc.T @ yc)
    assert abs(r["beta_qty"] - beta[0]) < 1e-4
    assert abs(r["beta_disc"] - beta[1]) < 1e-3  # discount scale is tiny
    intercept = y.mean() - beta @ X.mean(axis=0)
    assert abs(r["intercept"] - intercept) < 1e-3


def test_mm1_identities(spark):
    rows = QUERIES["events_mm1_queue_metrics"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["rho"] < 1  # stable queue by construction (mu = 1.25*max)
        lq = r["rho"] ** 2 / (1 - r["rho"])
        assert abs(r["lq"] - lq) < 1e-4
        # Little's law: Wq = Lq / lambda (in minutes)
        # recomputed from 6dp-rounded columns -> relative tolerance
        assert abs(r["wq_minutes"] - lq / r["lam_hr"] * 60) < 1e-4 * max(1.0, r["wq_minutes"])


def test_jackknife_matches_bruteforce(spark):
    got = {r["event_type"]: r for r in QUERIES["agg_jackknife_ratio"](spark, SF).collect()}
    rows = table(spark, SF, "events").select("event_type", "user_id", "value").collect()
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append((float(r["value"]), 1.0 if r["user_id"] % 3 == 0 else 0.0))
    for et, pairs in by_type.items():
        sy = sum(v for v, _ in pairs)
        sx = sum(x for _, x in pairs)
        n = len(pairs)
        r_full = sy / sx
        r_i = [(sy - v) / (sx - x) for v, x in pairs]
        rbar = sum(r_i) / n
        unbiased = n * r_full - (n - 1) * rbar
        se = ((n - 1) / n * sum((ri - rbar) ** 2 for ri in r_i)) ** 0.5
        g = got[et]
        assert g["n"] == n
        assert abs(g["ratio"] - r_full) < 1e-6
        assert abs(g["jackknife_unbiased"] - unbiased) < 1e-4
        assert abs(g["jackknife_se"] - se) < 1e-4
