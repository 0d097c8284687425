"""Waves 179-180: JL projection recomputed in numpy, bucket-audit mass
conservation, harmonic centrality vs a pure-Python BFS."""

from __future__ import annotations

import math
from collections import defaultdict, deque

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_jl_matches_numpy_and_concentrates(spark):
    rows = QUERIES["sim_random_projection_jl"](spark, SF).collect()
    assert len(rows) >= 400
    ratios = [r["distortion"] for r in rows]
    # JL concentration: mean ratio ~ 1 (d_out=16 -> std ~ sqrt(2/16) per pair)
    m = sum(ratios) / len(ratios)
    assert 0.85 < m < 1.15, m
    assert all(0.1 < r < 5.0 for r in ratios)

    # exact recompute of one pair in numpy (same quantization + signs)
    from data_ingestor_web_app_spark.llm.wave179 import _SIGNS

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in table(spark, SF, "embeddings")
        .where("vec_id <= 1")
        .select("vec_id", "embedding")
        .collect()
    }
    ei = {k: np.floor(v * 1e6).astype(np.int64) for k, v in emb.items()}
    S = np.array(_SIGNS, dtype=np.int64)
    p0, p1 = S @ ei[0], S @ ei[1]
    want_orig = int(((ei[0] - ei[1]) ** 2).sum())
    want_proj = int(((p0 - p1) ** 2).sum())
    got = next(r for r in rows if r["id_a"] == 0)
    assert got["dist2_orig"] == want_orig
    assert got["dist2_proj"] == want_proj
    assert got["distortion"] == want_proj / (16 * want_orig)


def test_bucket_audit_conserves_vectors(spark):
    rows = QUERIES["sim_bucket_balance_audit"](spark, SF).collect()
    n = table(spark, SF, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n
    assert sum(r["n_buckets"] for r in rows) <= 256
    for r in rows:
        assert r["n_vecs"] == r["load"] * r["n_buckets"]
    assert math.isclose(sum(r["share_of_vectors"] for r in rows), 1.0, abs_tol=1e-4)


def test_harmonic_closeness_matches_python_bfs(spark):
    rows = {r["part_key"]: r for r in QUERIES["graph_harmonic_closeness"](spark, SF).collect()}
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    pair_orders = defaultdict(set)
    for o, parts in by_order.items():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                pair_orders[(u, v)].add(o)
    adj = defaultdict(set)
    for (u, v), orders in pair_orders.items():
        if len(orders) >= 2:
            adj[u].add(v)
            adj[v].add(u)
    assert set(rows) == set(adj)
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        while q:
            x = q.popleft()
            if dist[x] == 3:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        n = [0, 0, 0, 0]
        for d in dist.values():
            n[d] += 1
        r = rows[s]
        assert (r["n_d1"], r["n_d2"], r["n_d3"]) == (n[1], n[2], n[3]), s
        h6 = 6 * n[1] + 3 * n[2] + 2 * n[3]
        assert r["h6"] == h6 and r["harmonic"] == h6 / 6.0
