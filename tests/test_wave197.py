"""Wave-197: MIPS reduction rank-equivalence + numpy argsort parity;
Mahalanobis vs numpy covariance; ESD vs a python peel loop."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily_units(spark):
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    n, b = Counter(), Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        n[d] += 1
        b[d] += int(math.floor(r["value"] + 0.5))
    return n, b


def test_mips_rank_equivalence_and_numpy(spark):
    rows = QUERIES["sim_mips_augmented"](spark, SF).collect()
    # the theorem under test: inner-product rank == augmented-L2 rank
    for r in rows:
        assert r["rank_dot"] == r["rank_aug"]
    emb = table(spark, SF, "embeddings").collect()
    X = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6
    ).astype(np.int64)
    ids = np.array([r["vec_id"] for r in emb])
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    got = {}
    for r in rows:
        got.setdefault(r["probe_id"], []).append(r)
    assert sorted(got) == list(ids[:5])
    for p, prows in got.items():
        pi = int(np.where(ids == p)[0][0])
        dots = X @ X[pi]
        # exclude self; tie-break by neighbor id ascending
        cand = sorted(
            ((int(dots[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != p),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        prows = sorted(prows, key=lambda r: r["rank_dot"])
        for rank, (r, (dot, nid)) in enumerate(zip(prows, cand), 1):
            assert r["rank_dot"] == rank
            assert r["neighbor_id"] == nid
            assert r["dot_q"] == dot


def test_mahalanobis_numpy(spark):
    rows = {r["day_idx"]: r for r in QUERIES["agg_mahalanobis_outliers"](spark, SF).collect()}
    nctr, bctr = _daily_units(spark)
    days = sorted(nctr)
    A = np.array([[nctr[d], bctr[d]] for d in days], dtype=np.float64)
    mu = A.mean(axis=0)
    cov = np.cov(A.T)  # ddof=1
    inv = np.linalg.inv(cov)
    for i, d in enumerate(days):
        c = A[i] - mu
        md2 = float(c @ inv @ c)
        assert abs(rows[d]["md2"] - md2) < 1e-4 * max(1.0, md2)
        assert rows[d]["is_outlier"] == (md2 > 7.377758908227871)
        assert rows[d]["n_events"] == nctr[d]
        assert rows[d]["units"] == bctr[d]
    assert len(rows) == len(days)


def test_esd_peel_replay(spark):
    rows = sorted(
        QUERIES["agg_esd_extremes"](spark, SF).collect(),
        key=lambda r: r["iteration"],
    )
    _, bctr = _daily_units(spark)
    remaining = dict(bctr)
    for it, row in enumerate(rows, 1):
        n = len(remaining)
        s = sum(remaining.values())
        s2 = sum(v * v for v in remaining.values())
        # argmax |n*x - s| with day tie-break
        day = min(remaining, key=lambda d: (-abs(n * remaining[d] - s), d))
        dev = abs(n * remaining[day] - s)
        sd = math.sqrt((n * s2 - s * s) / (n * n * (n - 1)))
        assert row["iteration"] == it
        assert row["day_idx"] == day
        assert row["units"] == remaining[day]
        assert abs(row["r_stat"] - dev / (n * sd)) < 1e-5
        del remaining[day]
    # r must not increase too wildly — sanity that studentization happened
    assert all(r["r_stat"] > 0 for r in rows)
