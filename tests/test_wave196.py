"""Wave-196: lag features vs a dict replay (calendar semantics), target
encoding vs closed form, local CC vs a networkx-free triangle count."""

from __future__ import annotations

from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_lag_features_calendar_semantics(spark):
    rows = QUERIES["pipeline_lag_features"](spark, SF).collect()
    ev = table(spark, SF, "events").select("user_id", "ts", "value").collect()
    from datetime import date

    daily_n, daily_c = Counter(), Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        k = (r["user_id"], d)
        daily_n[k] += 1
        import math

        daily_c[k] += int(math.floor(r["value"] * 100 + 0.5))
    assert len(rows) == len(daily_n)
    got = {(r["user_id"], r["day_idx"]): r for r in rows}
    for (u, d), n in daily_n.items():
        r = got[(u, d)]
        assert r["n_events"] == n
        assert r["cents"] == daily_c[(u, d)]
        # calendar lag: present ONLY if that exact day exists
        assert r["lag1_cents"] == (
            daily_c[(u, d - 1)] if (u, d - 1) in daily_c else None
        )
        assert r["lag7_cents"] == (
            daily_c[(u, d - 7)] if (u, d - 7) in daily_c else None
        )
        assert r["target_cents"] == (
            daily_c[(u, d + 1)] if (u, d + 1) in daily_c else None
        )
        win = [daily_c[(u, e)] for e in range(d - 6, d + 1) if (u, e) in daily_c]
        assert abs(r["roll7_avg"] - round(sum(win) / (100.0 * len(win)), 6)) < 1e-9


def test_target_encode_no_leakage(spark):
    rows = QUERIES["pipeline_target_encode"](spark, SF).collect()
    import math

    cust = table(spark, SF, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    ).collect()
    cents = {
        r["c_custkey"]: int(math.floor(r["c_acctbal"] * 100 + 0.5))
        for r in cust
    }
    nat = defaultdict(lambda: [0, 0])
    for r in cust:
        nat[r["c_nationkey"]][0] += 1
        nat[r["c_nationkey"]][1] += cents[r["c_custkey"]]
    gs = sum(cents.values())
    gn = len(cents)
    got = {r["c_custkey"]: r for r in rows}
    assert len(got) == gn
    for r in cust:
        n, s = nat[r["c_nationkey"]]
        x = cents[r["c_custkey"]]
        te = ((s - x) + 10.0 * gs / gn) / ((n - 1 + 10) * 100.0)
        assert abs(got[r["c_custkey"]]["te_loo"] - te) < 1e-5
    # leakage check: an all-alone category would shrink fully to the prior
    # (verified structurally: removing the row's own cents from the sum)


def test_clustering_coefficient_brute(spark):
    rows = {r["node"]: r for r in QUERIES["graph_clustering_coefficient"](spark, SF).collect()}
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
    edges = {p for p, c in support.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    for u, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2:
            assert u not in rows
            continue
        ns = sorted(nbrs)
        tri = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if (min(ns[i], ns[j]), max(ns[i], ns[j])) in edges
        )
        r = rows[u]
        assert r["degree"] == deg
        assert r["triangles"] == tri
        assert abs(r["clustering_coef"] - round(2.0 * tri / (deg * (deg - 1)), 6)) < 1e-9
    assert set(rows) == {u for u, nbrs in adj.items() if len(nbrs) >= 2}
