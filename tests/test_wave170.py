"""Wave-170: conductance identities vs python recomputation; Jarque-Bera
vs scipy-free moment recomputation."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_conductance_matches_bruteforce(spark):
    got = {r["community"]: r for r in QUERIES["graph_conductance_partition"](spark, SF).collect()}
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
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
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in table(spark, SF, "part").select("p_partkey", "p_brand").collect()
    }
    vol, cut = defaultdict(int), defaultdict(int)
    total = 0
    for r in edges:
        cu, cv = brand[r["u"]], brand[r["v"]]
        vol[cu] += 1
        vol[cv] += 1
        total += 2
        if cu != cv:
            cut[cu] += 1
            cut[cv] += 1
    for com, r in got.items():
        assert r["volume"] == vol[com]
        assert r["cut_edges"] == cut[com]
        denom = min(vol[com], total - vol[com])
        assert abs(r["conductance"] - round(cut[com] / denom, 6)) < 1e-9
        assert 0 <= r["conductance"] <= 1


def test_jarque_bera_moment_recompute(spark):
    rows = {r["event_type"]: r for r in QUERIES["agg_jarque_bera"](spark, SF).collect()}
    vals = defaultdict(list)
    for r in table(spark, SF, "events").select("event_type", "value").collect():
        vals[r["event_type"]].append(float(r["value"]))
    for et, xs in vals.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = n / 6 * (g1 * g1 + g2 * g2 / 4)
        r = rows[et]
        assert abs(r["skew_pop"] - g1) < 1e-4
        assert abs(r["excess_kurtosis_pop"] - g2) < 1e-4
        assert abs(r["jb_stat"] - jb) < max(1e-3, 1e-4 * abs(jb))
        assert r["reject_normal"] == (jb > 5.991464547107979)
