"""Wave-212: SMOTE vs a python mint replay; safety stock vs closed
form."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_smote_mint_replay(spark):
    rows = QUERIES["pipeline_smote_synthetic"](spark, SF).collect()
    emb = table(spark, SF, "embeddings").collect()
    Q = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype=np.float64) * 1e6
        ).astype(np.int64)
        for r in emb
    }
    sizes = Counter(r["label"] for r in emb)
    minority = min(sizes, key=lambda c: (sizes[c], c))
    members = sorted(r["vec_id"] for r in emb if r["label"] == minority)
    assert len(rows) == 2 * len(members)
    got = {(r["src_id"], r["k"]): r for r in rows}
    for p in members:
        cand = sorted(
            (int(((Q[p] - Q[o]) ** 2).sum()), o) for o in members if o != p
        )[:2]
        for k, (_, o) in enumerate(cand, 1):
            r = got[(p, k)]
            assert r["label"] == minority
            assert r["neighbor_id"] == o
            uraw = int(
                hashlib.md5(f"{p}_{k}".encode()).hexdigest()[:7], 16
            )
            u = uraw / 16**7
            assert r["u_nano"] == math.floor(u * 1e9)
            synth = Q[p] + np.floor(u * (Q[o] - Q[p])).astype(np.int64)
            assert r["checksum"] == int(synth.sum())
            assert 0 <= r["u_nano"] < 10**9


def test_safety_stock_closed_form(spark):
    rows = {r["event_type"]: r for r in QUERIES["inventory_safety_stock"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("ts", "event_type").collect()
    daily = Counter()
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] += 1
    per_type = {}
    for (t, _), c in daily.items():
        per_type.setdefault(t, []).append(c)
    assert set(rows) == set(per_type)
    z, lt = 1.6448536269514722, 7
    for t, ds in per_type.items():
        n = len(ds)
        mean = sum(ds) / n
        sd = math.sqrt(
            (n * sum(d * d for d in ds) - sum(ds) ** 2) / (n * n * (n - 1))
        )
        r = rows[t]
        assert r["n_days"] == n
        assert abs(r["mean_daily"] - mean) < 1e-6
        assert abs(r["sd_daily"] - sd) < 1e-6
        assert abs(r["safety_stock"] - z * sd * math.sqrt(lt)) < 1e-5
        assert abs(r["reorder_point"] - (mean * lt + z * sd * math.sqrt(lt))) < 1e-5
        assert r["reorder_point"] > r["safety_stock"]
