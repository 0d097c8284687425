"""Wave-214: LAD vs an exhaustive python search (and vs OLS loss);
Theil-Sen CI vs the textbook order-statistic computation."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    return sorted(y.items())


def test_lad_exhaustive(spark):
    row = QUERIES["model_lad_regression"](spark, SF).collect()[0]
    pts = _daily(spark)
    best = None
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            xi, yi = pts[i]
            xj, yj = pts[j]
            den = xj - xi
            absnum = sum(
                abs((y - yi) * den - (yj - yi) * (x - xi)) for x, y in pts
            )
            loss = absnum / den
            key = (loss, xi, xj)
            if best is None or key < best:
                best = key
    loss, xi, xj = best
    assert row["support_x1"] == xi
    assert row["support_x2"] == xj
    assert abs(row["l1_loss"] - loss) < 1e-3
    d = dict(pts)
    slope = (d[xj] - d[xi]) / (xj - xi)
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["intercept"] - (d[xi] - slope * xi)) < 1e-3
    # optimality: LAD loss <= the OLS line's L1 loss
    xs = np.array([x for x, _ in pts], dtype=np.float64)
    ys = np.array([y for _, y in pts], dtype=np.float64)
    A = np.vstack([xs, np.ones_like(xs)]).T
    coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
    ols_l1 = np.abs(ys - A @ coef).sum()
    assert row["l1_loss"] <= ols_l1 + 1e-6


def test_theil_sen_ci_orderstats(spark):
    row = QUERIES["model_theil_sen_ci"](spark, SF).collect()[0]
    pts = _daily(spark)
    n = len(pts)
    slopes = sorted(
        (
            ((yj - yi) / (xj - xi), xi, xj)
            for i, (xi, yi) in enumerate(pts)
            for (xj, yj) in pts[i + 1 :]
        )
    )
    m = len(slopes)
    c = 1.959963984540054 * math.sqrt(n * (n - 1.0) * (2 * n + 5) / 18.0)
    klo = int(math.floor((m - c) / 2))
    khi = min(int(math.ceil((m + c) / 2) + 1), m)
    vals = [s for s, _, _ in slopes]
    med = np.percentile(vals, 50, method="linear")
    assert row["n_days"] == n
    assert row["n_slopes"] == m
    assert abs(row["sen_slope"] - med) < 1e-5
    assert abs(row["ci_lo"] - vals[klo - 1]) < 1e-6
    assert abs(row["ci_hi"] - vals[khi - 1]) < 1e-6
    assert row["ci_lo"] <= row["sen_slope"] <= row["ci_hi"]
