"""Wave-240: rich-club / reciprocity / Molloy-Reed vs a networkx-free
python graph replay built straight from the raw events."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.01"  # sf0.001's co-occurrence graph is empty


def _buckets(spark):
    rows = (
        table(spark, SF, "events")
        .selectExpr("user_id", "event_type", "date_trunc('minute', ts) AS m", "ts")
        .collect()
    )
    b = defaultdict(set)
    first = {}
    for r in rows:
        b[(r.event_type, r.m)].add(r.user_id)
        k = (r.user_id, r.event_type, r.m)
        if k not in first or r.ts < first[k]:
            first[k] = r.ts
    return b, first


def _undirected(spark):
    b, _ = _buckets(spark)
    edges = set()
    for users in b.values():
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                edges.add((us[i], us[j]))
    return edges


def test_rich_club_replay(spark):
    rows = {r.kmin: r for r in QUERIES["graph_rich_club"](spark, SF).collect()}
    edges = _undirected(spark)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    for kmin in (1, 2, 3, 5, 8):
        club = {n for n, k in deg.items() if k > kmin}
        ek = sum(1 for u, v in edges if u in club and v in club)
        nk = len(club)
        phi = 2 * ek / (nk * (nk - 1)) if nk >= 2 else 0.0
        r = rows[kmin]
        assert r.n_k == nk and r.e_k == ek, kmin
        assert abs(r.phi - round(phi, 6)) < 1e-9, kmin
    # clubs are nested: N_k and E_k are non-increasing in k
    ks = sorted(rows)
    for a, b2 in zip(ks, ks[1:]):
        assert rows[a].n_k >= rows[b2].n_k and rows[a].e_k >= rows[b2].e_k


def test_reciprocity_replay(spark):
    row = QUERIES["graph_reciprocity"](spark, SF).collect()[0]
    b, first = _buckets(spark)
    arcs = set()
    for (et, m), users in b.items():
        us = list(users)
        for u in us:
            for v in us:
                if u == v:
                    continue
                tu, tv = first[(u, et, m)], first[(v, et, m)]
                if tu < tv or (tu == tv and u < v):
                    arcs.add((u, v))
    mutual = sum(1 for (u, v) in arcs if (v, u) in arcs)
    assert row.n_arcs == len(arcs)
    assert row.n_mutual == mutual
    assert abs(row.reciprocity - round(mutual / len(arcs), 6)) < 1e-9
    assert 0 <= row.reciprocity <= 1


def test_molloy_reed_replay(spark):
    row = QUERIES["graph_molloy_reed"](spark, SF).collect()[0]
    edges = _undirected(spark)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    n = len(deg)
    sk = sum(deg.values())
    sk2 = sum(k * k for k in deg.values())
    kappa = sk2 / sk
    assert row.n_nodes == n
    assert abs(row.mean_k - round(sk / n, 6)) < 1e-9
    assert abs(row.kappa - round(kappa, 6)) < 1e-9
    assert bool(row.giant_component_expected) == (kappa > 2.0)
    assert abs(row.critical_removal_fraction - round(1 - 1 / (kappa - 1), 6)) < 1e-9
    # mean degree is 2E/N by the handshake lemma
    assert abs(row.mean_k - 2 * len(edges) / n) < 1e-6
