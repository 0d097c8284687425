"""Wave-164: Katz vs python walk counting; Allen relations exhaustive +
exclusive; Hoeffding audit internal consistency."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _adj(spark):
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
        .collect()
    )
    adj = defaultdict(list)
    for r in rows:
        adj[r["u"]].append(r["v"])
        adj[r["v"]].append(r["u"])
    return adj


def test_katz_matches_walk_counting(spark):
    adj = _adj(spark)
    w = {u: 1 for u in adj}
    katz = {u: 0.0 for u in adj}
    for r in range(1, 6):
        w = {u: sum(w[v] for v in adj[u]) for u in adj}
        for u in adj:
            katz[u] += 0.1**r * w[u]
    got = QUERIES["graph_katz_unrolled"](spark, SF).collect()
    assert got
    for row in got:
        assert abs(round(katz[row["u"]], 6) - row["katz"]) < 1e-9
    top = sorted(katz.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[: len(got)]
    assert [u for u, _ in top] == [r["u"] for r in got]


def test_allen_relations_partition_all_pairs(spark):
    rows = QUERIES["events_allen_relations"](spark, SF).collect()
    assert rows
    total_pairs = sum(r["n_pairs"] for r in rows)
    spans = (
        table(spark, SF, "events")
        .groupBy("user_id", "event_type")
        .agg(F.unix_micros(F.min("ts")).alias("s"), F.unix_micros(F.max("ts")).alias("f"))
        .where(F.col("s") < F.col("f"))
        .groupBy("user_id")
        .agg(F.count("*").alias("k"))
        .collect()
    )
    expected = sum(r["k"] * (r["k"] - 1) // 2 for r in spans)
    # the 13 relations are exhaustive: every pair classified exactly once
    assert total_pairs == expected
    names = {r["relation"] for r in rows}
    assert None not in names
    assert names <= {
        "before", "meets", "equal", "starts", "started_by", "finishes",
        "finished_by", "during", "contains", "overlaps", "overlapped_by",
        "after", "met_by",
    }


def test_hoeffding_audit_consistency(spark):
    rows = QUERIES["agg_hoeffding_audit"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["hoeffding_halfwidth"] > 0
        within = abs(r["mean_b"] - r["mean_a"]) <= r["hoeffding_halfwidth"] + 1e-6
        assert r["holdout_within_bound"] == within
