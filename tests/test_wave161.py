"""Wave-161: link-prediction scores vs a pure-python brute force on the
collected (small-fixture) edge set."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _edges(spark):
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    rows = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count_distinct("a.l_orderkey").alias("no"))
        .where(F.col("no") >= 2)
        .select("u", "v")
        .collect()
    )
    return {(r["u"], r["v"]) for r in rows}


def _neighborhoods(edges):
    nb = defaultdict(set)
    for u, v in edges:
        nb[u].add(v)
        nb[v].add(u)
    return nb


def test_link_scores_match_bruteforce(spark):
    edges = _edges(spark)
    nb = _neighborhoods(edges)
    nodes = sorted(nb)
    cn_bf, aa_bf, jac_bf = {}, {}, {}
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if (x, y) in edges:
                continue
            common = nb[x] & nb[y]
            if not common:
                continue
            cn_bf[(x, y)] = len(common)
            aa = sum(1.0 / math.log(len(nb[w])) for w in common if len(nb[w]) >= 2)
            if aa:
                aa_bf[(x, y)] = round(aa, 6)
            jac_bf[(x, y)] = round(len(common) / (len(nb[x]) + len(nb[y]) - len(common)), 6)

    got_cn = QUERIES["graph_common_neighbors"](spark, SF).collect()
    assert got_cn
    for r in got_cn:
        assert cn_bf[(r["x"], r["y"])] == r["cn"]
    # the top-1 must be the global max score
    assert got_cn[0]["cn"] == max(cn_bf.values())

    got_aa = QUERIES["graph_adamic_adar"](spark, SF).collect()
    for r in got_aa:
        assert abs(aa_bf[(r["x"], r["y"])] - r["aa"]) < 1e-6

    got_j = QUERIES["graph_jaccard_links"](spark, SF).collect()
    for r in got_j:
        assert abs(jac_bf[(r["x"], r["y"])] - r["jac"]) < 1e-6
        assert cn_bf[(r["x"], r["y"])] == r["c"]
