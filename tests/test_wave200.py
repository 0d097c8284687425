"""Wave-200: LOF vs a from-scratch python implementation on the same
quantized vectors; Hoover vs closed form."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_lof_python_replay(spark):
    rows = {r["vec_id"]: r for r in QUERIES["sim_lof_bucketed"](spark, SF).collect()}
    emb = table(spark, SF, "embeddings").collect()
    X = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6
    ).astype(np.int64)
    ids = [r["vec_id"] for r in emb]
    labels = [r["label"] for r in emb]
    by_label = {}
    for j, lab in enumerate(labels):
        by_label.setdefault(lab, []).append(j)
    K = 5
    knn, kdist2 = {}, {}
    for lab, members in by_label.items():
        for j in members:
            cand = sorted(
                (
                    (int(((X[j] - X[m]) ** 2).sum()), ids[m])
                    for m in members
                    if m != j
                ),
            )[:K]
            knn[ids[j]] = cand
            kdist2[ids[j]] = max(d for d, _ in cand)
    lrd = {}
    for p, neigh in knn.items():
        s = sum(math.sqrt(max(kdist2[o], d)) for d, o in neigh)
        lrd[p] = K / s
    for p, neigh in knn.items():
        lof = sum(lrd[o] for _, o in neigh) / (K * lrd[p])
        r = rows[p]
        assert abs(r["lof"] - lof) < 1e-5
        assert abs(r["kdist"] - math.sqrt(kdist2[p]) / 1e6) < 1e-5
    assert set(rows) == set(knn)
    # LOF should hover around 1 for the bulk of a gaussian cluster
    med = float(np.median([r["lof"] for r in rows.values()]))
    assert 0.8 < med < 1.5


def test_hoover_closed_form(spark):
    row = QUERIES["agg_hoover_index"](spark, SF).collect()[0]
    ps = [
        r["o_totalprice"]
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
        if r["o_totalprice"] > 0
    ]
    cents = [int(math.floor(p * 100 + 0.5)) for p in ps]
    n, s = len(cents), sum(cents)
    hoover = sum(abs(n * c - s) for c in cents) / (2.0 * n * s)
    assert row["n"] == n
    assert row["total_cents"] == s
    assert abs(row["hoover"] - hoover) < 1e-6
    assert 0.0 <= row["hoover"] <= 1.0
