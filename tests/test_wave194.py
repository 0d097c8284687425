"""Wave-194: simplified silhouette / Calinski-Harabasz / Davies-Bouldin
vs straight numpy recomputes on the same 1e6-quantized vectors."""

from __future__ import annotations

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _load(spark):
    rows = table(spark, SF, "embeddings").collect()
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6
    )
    y = np.array([r["label"] for r in rows])
    return X, y


def test_silhouette_simplified_numpy(spark):
    got = {r["label"]: r for r in QUERIES["sim_silhouette_simplified"](spark, SF).collect()}
    X, y = _load(spark)
    labels = np.unique(y)
    cents = {c: X[y == c].mean(axis=0) for c in labels}
    per_cluster = {c: [] for c in labels}
    for x, own in zip(X, y):
        d = {c: np.linalg.norm(x - mu) for c, mu in cents.items()}
        a = d[own]
        b = min(v for c, v in d.items() if c != own)
        per_cluster[own].append((b - a) / max(a, b))
    assert set(got) == set(labels)
    for c in labels:
        s = np.array(per_cluster[c])
        assert got[c]["n_points"] == len(s)
        assert abs(got[c]["mean_silhouette"] - s.mean()) < 1e-5
        assert abs(got[c]["frac_positive"] - (s > 0).mean()) < 1e-6
        assert -1.0 <= got[c]["mean_silhouette"] <= 1.0


def test_cluster_validity_numpy(spark):
    row = QUERIES["sim_cluster_validity"](spark, SF).collect()[0]
    X, y = _load(spark)
    labels = np.unique(y)
    n, k = len(X), len(labels)
    g = X.mean(axis=0)
    W = B = 0.0
    scatters, cents = {}, {}
    for c in labels:
        Xc = X[y == c]
        mu = Xc.mean(axis=0)
        cents[c] = mu
        wc = ((Xc - mu) ** 2).sum()
        W += wc
        B += len(Xc) * ((mu - g) ** 2).sum()
        scatters[c] = np.sqrt(wc / len(Xc))
    ch = (B / (k - 1)) / (W / (n - k))
    rmx = {}
    for i in labels:
        rmx[i] = max(
            (scatters[i] + scatters[j]) / np.linalg.norm(cents[i] - cents[j])
            for j in labels
            if j != i
        )
    db = sum(rmx.values()) / k
    assert row["n_points"] == n
    assert row["k_clusters"] == k
    assert abs(row["w_ss"] - W / 1e12) < max(1e-4, W / 1e12 * 1e-9)
    assert abs(row["b_ss"] - B / 1e12) < max(1e-4, B / 1e12 * 1e-9)
    assert abs(row["calinski_harabasz"] - ch) < 1e-4 * max(1.0, ch)
    assert abs(row["davies_bouldin"] - db) < 1e-4 * max(1.0, db)
    # sanity: labeled gaussian-ish fixture should separate at least weakly
    assert row["calinski_harabasz"] > 0
    assert row["davies_bouldin"] > 0
