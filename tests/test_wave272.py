"""Wave-272: split-half vs a parity-counting replay (plus the
Spearman-Brown step-up property SB >= r for r > 0), triangle null
model vs a brute-force graph replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
GRAPH_SF = "/root/testdata/sf0.01"  # sf0.001's co-occurrence graph is empty


def test_splithalf_replay(spark):
    row = QUERIES["model_splithalf_reliability"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "dayofmonth(ts) % 2 AS par"
    ).collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        per[r.user_id][r.par] += 1  # par 1 = odd day
    xs = [v[1] for v in per.values()]
    ys = [v[0] for v in per.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum(x * y for x, y in zip(xs, ys)) - n * mx * my
    den = math.sqrt(
        (sum(x * x for x in xs) - n * mx * mx)
        * (sum(y * y for y in ys) - n * my * my)
    )
    r = num / den
    sb = 2 * r / (1 + r)
    assert row.n_users == n
    assert abs(row.splithalf_r - round(r, 6)) < 1e-6
    assert abs(row.spearman_brown - round(sb, 6)) < 1e-6
    assert bool(row.trait_stable) == (sb >= 0.7)
    if r > 0:
        assert row.spearman_brown >= row.splithalf_r - 1e-9


def test_triangle_nullmodel_replay(spark):
    row = QUERIES["graph_triangle_nullmodel"](spark, GRAPH_SF).collect()[0]
    ev = table(spark, GRAPH_SF, "events").selectExpr(
        "user_id", "event_type", "date_trunc('minute', ts) AS m"
    ).collect()
    buckets = defaultdict(set)
    for r in ev:
        buckets[(r.event_type, r.m)].add(r.user_id)
    edges = set()
    for users in buckets.values():
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                edges.add((us[i], us[j]))
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    tris = 0
    es = edges
    for (u, v) in es:
        for w in deg:
            if w > v and (v, w) in es and (u, w) in es:
                tris += 1
    sk = sum(deg.values())
    skk1 = sum(k * (k - 1) for k in deg.values())
    lam = skk1 / sk
    expected = lam**3 / 6
    assert row.observed_triangles == tris
    assert abs(row.expected_chung_lu - round(expected, 6)) < 1e-4
    assert abs(row.clustering_excess - round(tris / expected, 6)) < 1e-4
    # co-occurrence graphs are built FROM shared buckets, so clustering
    # must exceed the degree-sequence null substantially
    assert row.clustering_excess > 1
