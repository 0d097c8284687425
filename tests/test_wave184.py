"""Wave-184: both DPs recomputed in pure Python."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_weighted_interval_scheduling_matches_python_dp(spark):
    out = {r["c_custkey"]: r for r in QUERIES["opt_weighted_interval_scheduling"](spark, SF).collect()}
    o = table(spark, SF, "orders").selectExpr(
        "o_custkey",
        "CAST(o_orderdate AS DATE) AS s",
        "CAST(o_orderkey % 7 + 1 AS INT) AS span",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w",
        "o_orderkey",
    ).collect()
    per = defaultdict(list)
    for r in o:
        per[r["o_custkey"]].append(
            (r["s"] + timedelta(days=r["span"]), r["s"], r["o_orderkey"], r["w"])
        )
    assert set(per) == set(out)
    for k, iv in per.items():
        iv.sort()  # (end, start, orderkey)
        f = [0]
        for i, (e, s, _, w) in enumerate(iv, start=1):
            p = max((j for j in range(1, i) if iv[j - 1][0] <= s), default=0)
            f.append(max(f[i - 1], f[p] + w))
        assert out[k]["n_intervals"] == len(iv)
        assert out[k]["best_weight_cents"] == f[-1], k


def test_knapsack_matches_python_dp(spark):
    out = {r["s_suppkey"]: r for r in QUERIES["opt_knapsack_01"](spark, SF).collect()}
    li = (
        table(spark, SF, "lineitem")
        .where("l_orderkey % 19 = 0")
        .selectExpr(
            "l_suppkey",
            "CAST(l_quantity AS BIGINT) AS w",
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v",
        )
        .collect()
    )
    per = defaultdict(list)
    for r in li:
        per[r["l_suppkey"]].append((r["w"], r["v"]))
    assert set(per) == set(out)
    for k, items in per.items():
        f = [0] * 101
        for w, v in items:
            for j in range(100, int(w) - 1, -1):
                f[j] = max(f[j], f[j - int(w)] + v)
        got = out[k]
        assert got["n_items"] == len(items)
        assert got["best_value_cents"] == f[100], k
        assert got["best_value_halfcap_cents"] == f[50], k
        assert got["best_value_halfcap_cents"] <= got["best_value_cents"]
