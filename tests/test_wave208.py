"""Wave-208: personalized PageRank vs an exact python fixed-point
replay, plus localization sanity vs global PageRank."""

from __future__ import annotations

from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_ppr_fixed_point_replay(spark):
    rows = sorted(
        QUERIES["graph_ppr_unrolled"](spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    support = Counter()
    for parts in orders.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    edges = [p for p, c in support.items() if c >= 2]
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    deg = {u: len(vs) for u, vs in adj.items()}
    seed = min(deg, key=lambda u: (-deg[u], u))
    SCALE = 10**12
    m = {u: (SCALE if u == seed else 0) for u in deg}
    for _ in range(8):
        inmass = Counter()
        for u, vs in adj.items():
            c = m[u] // deg[u]
            for v in vs:
                inmass[v] += c
        m = {
            u: (15 * SCALE // 100 if u == seed else 0)
            + (85 * inmass[u]) // 100
            for u in deg
        }
    top = sorted(m, key=lambda u: (-m[u], u))[:20]
    assert [r["node"] for r in rows] == top
    for rank, (r, u) in enumerate(zip(rows, top), 1):
        assert r["rank"] == rank
        assert r["ppr_pico"] == m[u]
    # the seed dominates its own PPR, and mass is localized: the top-20
    # hold most of the surviving mass
    assert rows[0]["node"] == seed
    assert rows[0]["ppr"] > 0.1
