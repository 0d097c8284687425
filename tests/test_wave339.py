"""Wave-339: Wagner-Whitin vs a direct python DP, including an
exhaustive check over all 2^11 order policies."""

from __future__ import annotations

from itertools import product

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
K, H, T = 100, 1, 12


def _demands(spark):
    rows = (
        table(spark, SF, "orders")
        .where("year(o_orderdate) = 1998")
        .selectExpr("month(o_orderdate) AS t")
        .collect()
    )
    d = [0] * (T + 1)
    for r in rows:
        d[r["t"]] += 1
    return d


def _policy_cost(d, orders):
    """orders: set of periods with a setup; all demand satisfied from
    the latest order at or before it."""
    cost = 0
    for t in range(1, T + 1):
        if d[t] == 0 and t not in orders:
            continue
        j = max((o for o in orders if o <= t), default=None)
        if j is None:
            return None  # infeasible
        cost += H * (t - j) * d[t]
    return cost + K * len(orders)


def test_wagner_whitin_dp_and_exhaustive(spark):
    d = _demands(spark)
    # python DP replay
    f = [0] * (T + 1)
    js = [0] * (T + 1)
    for t in range(1, T + 1):
        best, bj = None, None
        for j in range(1, t + 1):
            hold = sum(H * (i - j) * d[i] for i in range(j, t + 1))
            cand = f[j - 1] + K + hold
            if best is None or cand < best:
                best, bj = cand, j
        f[t], js[t] = best, bj
    got = {r["period"]: r for r in QUERIES["opt_wagner_whitin"](spark, SF).collect()}
    assert len(got) == T
    for t in range(1, T + 1):
        assert got[t]["demand"] == d[t]
        assert got[t]["optimal_cost_to_t"] == f[t]
        assert got[t]["last_order_period"] == js[t]
        assert got[t]["orders_here"] == (js[t] == t)
    # exhaustive optimality proof over every policy with an order in p1
    best_exh = min(
        c
        for bits in product([0, 1], repeat=T - 1)
        for c in [_policy_cost(d, {1} | {i + 2 for i, b in enumerate(bits) if b})]
        if c is not None
    )
    assert f[T] == best_exh
