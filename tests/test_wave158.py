"""Wave-158: CC vs python union-find; LPA partition invariants."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _edges(spark):
    per = defaultdict(set)
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect():
        per[r["l_orderkey"]].add(r["l_partkey"])
    cnt = defaultdict(set)
    for ok, parts in per.items():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                cnt[(u, v)].add(ok)
    return [uv for uv, oks in cnt.items() if len(oks) >= 2]


def test_giant_component_matches_union_find(spark):
    r = QUERIES["graph_giant_component"](spark, SF).collect()
    edges = _edges(spark)
    if not edges:
        assert not r or r[0]["n_nodes"] in (0, None)
        return
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    comps = defaultdict(int)
    for node in {n for e in edges for n in e}:
        comps[find(node)] += 1
    row = r[0]
    assert row["n_nodes"] == sum(comps.values())
    assert row["n_components"] == len(comps)
    assert row["giant_size"] == max(comps.values())


def test_lpa_partition_invariants(spark):
    edges = _edges(spark)
    rows = QUERIES["graph_label_propagation"](spark, SF).collect()
    if not edges:
        return
    r = rows[0]
    n_nodes = len({n for e in edges for n in e})
    assert 1 <= r["n_communities"] <= n_nodes
    assert 1 <= r["largest"] <= n_nodes
    assert r["sq_size_sum"] >= r["largest"] ** 2
    # communities partition the node set: sizes sum to n (via sq bound
    # sanity: singletons + largest <= n)
    assert r["singletons"] + r["largest"] <= n_nodes
