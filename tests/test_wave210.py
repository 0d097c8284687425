"""Wave-210: Engle-Granger vs a numpy two-step replay; anisotropy vs a
full O(n^2) pairwise cosine computation."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cointegration_numpy_replay(spark):
    row = QUERIES["events_cointegration_eg"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    x, y = Counter(), Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        x[d] += 1
        y[d] += int(math.floor(r["value"] + 0.5))
    days = sorted(x)
    xv = np.array([x[d] for d in days], dtype=np.float64)
    yv = np.array([y[d] for d in days], dtype=np.float64)
    n = len(days)
    b = ((n * (xv * yv).sum() - xv.sum() * yv.sum())
         / (n * (xv * xv).sum() - xv.sum() ** 2))
    a = (yv.sum() - b * xv.sum()) / n
    r = {d: math.floor(1e6 * (y[d] - a - b * x[d])) for d in days}
    pairs = [(r[d - 1], r[d] - r[d - 1]) for d in days if d - 1 in r]
    rp = np.array([p for p, _ in pairs], dtype=np.float64)
    dr = np.array([q for _, q in pairs], dtype=np.float64)
    m = len(pairs)
    phi = (rp * dr).sum() / (rp * rp).sum()
    sse = (dr * dr).sum() - phi * (rp * dr).sum()
    se = math.sqrt(sse / ((m - 1) * (rp * rp).sum()))
    t = phi / se
    assert row["n_days"] == n
    assert abs(row["coint_beta"] - b) < 1e-4 * max(1.0, abs(b))
    assert abs(row["phi"] - phi) < 1e-4
    assert abs(row["df_tstat"] - t) < 1e-3
    assert row["cointegrated_5pct"] == (t < -3.34)


def test_anisotropy_vs_pairwise(spark):
    row = QUERIES["sim_anisotropy_audit"](spark, SF).collect()[0]
    emb = table(spark, SF, "embeddings").collect()
    Q = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6
    )
    U = np.floor(Q * 1e6 / np.sqrt((Q * Q).sum(axis=1, keepdims=True)))
    n = len(U)
    S = U.sum(axis=0)
    s2 = float((S * S).sum())
    suu = float((U * U).sum())
    mrl = math.sqrt(s2) / (1e6 * n)
    mpc = (s2 - suu) / (n * (n - 1) * 1e12)
    assert row["n_vectors"] == n
    assert abs(row["mean_resultant_length"] - mrl) < 1e-5
    assert abs(row["mean_pairwise_cosine"] - mpc) < 1e-5
    # identity check against the brute-force O(n^2) pairwise mean
    G = U @ U.T
    brute = (G.sum() - np.trace(G)) / (n * (n - 1) * 1e12)
    assert abs(mpc - brute) < 1e-9
    assert row["anisotropic"] == (mpc > 0.5)
    # random gaussian-ish cloud: should NOT be strongly anisotropic
    assert row["mean_pairwise_cosine"] < 0.9
