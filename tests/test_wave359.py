"""Wave-359: bin-packing bounds vs a python sweep + first-fit
feasibility sandwich."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
C = 1000


def test_bin_packing_bounds_replay(spark):
    rows = (
        table(spark, SF, "orders")
        .where("year(o_orderdate) = 1998 AND month(o_orderdate) = 1")
        .selectExpr(
            "CAST(1 + CAST(ROUND(o_totalprice*100) AS LONG) % 700 AS LONG)"
            " AS s"
        )
        .collect()
    )
    sizes = [r["s"] for r in rows]
    n = len(sizes)
    l1 = math.ceil(sum(sizes) / C)
    alphas = sorted({s for s in sizes if s <= C // 2} | {0})
    best, astar = -1, None
    for a in alphas:
        n1 = sum(1 for s in sizes if s > C - a)
        n2 = sum(1 for s in sizes if C // 2 < s <= C - a)
        s2 = sum(s for s in sizes if C // 2 < s <= C - a)
        s3 = sum(s for s in sizes if a <= s <= C // 2)
        resid = s3 - (n2 * C - s2)
        l2a = n1 + n2 + (math.ceil(resid / C) if resid > 0 else 0)
        if l2a > best:
            best, astar = l2a, a
    row = QUERIES["opt_bin_packing_bounds"](spark, SF).first()
    assert row["n_items"] == n
    assert row["l1_bound"] == l1
    assert row["l2_bound"] == best
    assert row["alpha_star"] == astar
    assert row["l2_dominates"]
    assert best >= l1  # Martello-Toth dominance
    # sandwich: first-fit-decreasing packs within the bounds
    bins = []
    for s in sorted(sizes, reverse=True):
        for i, b in enumerate(bins):
            if b + s <= C:
                bins[i] += s
                break
        else:
            bins.append(s)
    assert l1 <= best <= len(bins) <= n
