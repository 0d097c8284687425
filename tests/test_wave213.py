"""Wave-213: eccentricity vs a python BFS; G-test vs scipy-free closed
form with the real Williams correction."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict, deque

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_eccentricity_python_bfs(spark):
    rows = {r["source"]: r for r in QUERIES["graph_eccentricity_sample"](spark, SF).collect()}
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
    adj = defaultdict(set)
    for (u, v), c in support.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    nodes = sorted(adj)
    key = lambda u: (int(hashlib.md5(str(u).encode()).hexdigest()[:2], 16), u)
    srcs = sorted(nodes, key=key)[:4]
    assert sorted(rows) == sorted(srcs)
    dia = 0
    for s in srcs:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= 8:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        ecc = max(dist.values())
        r = rows[s]
        assert r["eccentricity"] == ecc
        assert r["reached"] == len(dist)
        dia = max(dia, ecc)
    for r in rows.values():
        assert r["diameter_lb"] == dia


def test_g_test_closed_form(spark):
    row = QUERIES["agg_g_test"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "event_type").collect()
    cells = Counter()
    for r in ev:
        dow = (r["ts"].date().isoweekday() % 7) + 1
        cells[(dow, r["event_type"])] += 1
    n = sum(cells.values())
    rt, ct = Counter(), Counter()
    for (d, t), o in cells.items():
        rt[d] += o
        ct[t] += o
    g = 2 * sum(
        o * math.log(o * n / (rt[d] * ct[t])) for (d, t), o in cells.items()
    )
    r_, c_ = len(rt), len(ct)
    q = 1 + (n * sum(1 / v for v in rt.values()) - 1) * (
        n * sum(1 / v for v in ct.values()) - 1
    ) / (6.0 * n * (r_ - 1) * (c_ - 1))
    assert row["n"] == n
    assert row["dof"] == (r_ - 1) * (c_ - 1)
    assert abs(row["g_stat"] - g) < 1e-4
    assert abs(row["g_williams"] - g / q) < 1e-4
    # the correction always shrinks G
    assert row["g_williams"] <= row["g_stat"]
