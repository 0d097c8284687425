"""Wave-195: Hopkins vs a full numpy replay (md5 probes included);
Dunn centroid variant vs numpy."""

from __future__ import annotations

import hashlib

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _load(spark):
    rows = table(spark, SF, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6
    )
    y = np.array([r["label"] for r in rows])
    return ids, X, y


def _h7(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def test_hopkins_full_replay(spark):
    row = QUERIES["sim_hopkins"](spark, SF).collect()[0]
    ids, X, _ = _load(spark)
    lo, hi = X.min(axis=0), X.max(axis=0)
    order = sorted(range(len(ids)), key=lambda j: (_h7(str(ids[j])), ids[j]))
    hold = order[:20]
    sw = 0.0
    for j in hold:
        d2 = ((X - X[j]) ** 2).sum(axis=1)
        d2[j] = np.inf
        sw += np.sqrt(d2.min())
    su = 0.0
    for pid in range(1, 21):
        p = np.array(
            [
                lo[i]
                + np.floor(
                    _h7(f"{pid}_{i + 1}") / 16**7 * (hi[i] - lo[i])
                )
                for i in range(X.shape[1])
            ]
        )
        su += np.sqrt(((X - p) ** 2).sum(axis=1).min())
    assert row["n_probes"] == 20
    assert abs(row["sum_u"] - su / 1e6) < 1e-4
    assert abs(row["sum_w"] - sw / 1e6) < 1e-4
    assert abs(row["hopkins_h"] - su / (su + sw)) < 1e-5
    # labeled gaussian fixture: should lean clustered, and never degenerate
    assert 0.0 < row["hopkins_h"] < 1.0


def test_dunn_centroid_numpy(spark):
    row = QUERIES["sim_dunn_centroid"](spark, SF).collect()[0]
    _, X, y = _load(spark)
    labels = np.unique(y)
    cents = {c: X[y == c].mean(axis=0) for c in labels}
    diam = {}
    for c in labels:
        Xc = X[y == c]
        # engine floors each point-to-centroid distance to integer
        # quantized units before averaging
        d = np.floor(np.sqrt(((Xc - cents[c]) ** 2).sum(axis=1)))
        diam[c] = 2.0 * d.mean()
    gaps = [
        np.linalg.norm(cents[i] - cents[j])
        for i in labels
        for j in labels
        if i < j
    ]
    mingap, maxdia = min(gaps), max(diam.values())
    assert row["k_clusters"] == len(labels)
    assert abs(row["min_intercentroid"] - mingap / 1e6) < 1e-4
    assert abs(row["max_diameter"] - maxdia / 1e6) < 1e-4
    assert abs(row["dunn_index"] - mingap / maxdia) < 1e-5
