"""Wave-211: TwoNN vs a python NN replay; Chow vs numpy segment SSEs."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_twonn_replay(spark):
    row = QUERIES["sim_twonn_intrinsic_dim"](spark, SF).collect()[0]
    emb = table(spark, SF, "embeddings").collect()
    Q = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6
    ).astype(np.int64)
    ids = [r["vec_id"] for r in emb]
    labels = [r["label"] for r in emb]
    by_label = {}
    for j, lab in enumerate(labels):
        by_label.setdefault(lab, []).append(j)
    sln = 0
    cnt = 0
    for lab, members in by_label.items():
        for j in members:
            cand = sorted(
                (int(((Q[j] - Q[m]) ** 2).sum()), ids[m])
                for m in members
                if m != j
            )[:2]
            d1, d2 = cand[0][0], cand[1][0]
            if d1 > 0:
                sln += math.floor(0.5 * math.log(d2 / d1) * 1e9)
                cnt += 1
    assert row["n_points"] == cnt
    assert abs(row["mean_ln_mu"] - sln / (1e9 * cnt)) < 1e-6
    assert abs(row["intrinsic_dim"] - cnt * 1e9 / sln) < 1e-3
    # a 64-dim gaussian cloud: the estimate must be positive and finite,
    # and cannot exceed the ambient dimension by much
    assert 1.0 < row["intrinsic_dim"] < 100.0


def test_chow_numpy(spark):
    row = QUERIES["model_chow_test"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    days = np.array(sorted(y), dtype=np.float64)
    vals = np.array([y[int(d)] for d in days], dtype=np.float64)

    def sse(xs, ys):
        A = np.vstack([xs, np.ones_like(xs)]).T
        coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
        return float(((ys - A @ coef) ** 2).sum())

    s0 = sse(days, vals)
    lm = days < 15
    s1, s2 = sse(days[lm], vals[lm]), sse(days[~lm], vals[~lm])
    n = len(days)
    f = ((s0 - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
    assert row["n_days"] == n
    assert row["breakpoint"] == 15
    assert abs(row["sse_pooled"] - s0) < max(1.0, s0 * 1e-6)
    assert abs(row["sse_split"] - (s1 + s2)) < max(1.0, (s1 + s2) * 1e-6)
    assert abs(row["chow_f"] - f) < max(1e-4, abs(f) * 1e-3)
    assert row["chow_f"] >= 0
