"""Wave-344: EDD/WSPT vs python schedule replays (with exchange-
argument optimality spot checks); Vickrey vs a per-lot sort."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _jobs(spark):
    rows = (
        table(spark, SF, "orders")
        .where("year(o_orderdate) = 1998 AND month(o_orderdate) = 1")
        .selectExpr(
            "o_orderkey AS job",
            "CAST(1 + CAST(ROUND(o_totalprice*100) AS LONG) % 240 AS LONG)"
            " AS p",
            "CAST(500 + (o_orderkey * 37) % 20000 AS LONG) AS due",
            "CAST(1 + o_orderkey % 5 AS LONG) AS w",
        )
        .collect()
    )
    return [(r["job"], r["p"], r["due"], r["w"]) for r in rows]


def test_edd_replay_and_optimality(spark):
    jobs = _jobs(spark)
    order = sorted(jobs, key=lambda j: (j[2], j[0]))
    t = 0
    lat = []
    for job, p, due, w in order:
        t += p
        lat.append(t - due)
    row = QUERIES["opt_edd_max_lateness"](spark, SF).first()
    assert row["n_jobs"] == len(jobs)
    assert row["makespan"] == sum(p for _, p, _, _ in jobs)
    assert row["max_lateness"] == max(lat)
    assert row["n_tardy"] == sum(1 for x in lat if x > 0)
    assert row["total_tardiness"] == sum(max(x, 0) for x in lat)
    # exchange argument: swapping any adjacent pair never helps L_max
    for i in range(min(len(order) - 1, 40)):
        swapped = order[:i] + [order[i + 1], order[i]] + order[i + 2 :]
        t2, worst = 0, -(10**18)
        for job, p, due, w in swapped:
            t2 += p
            worst = max(worst, t2 - due)
        assert worst >= row["max_lateness"]


def test_wspt_replay_and_optimality(spark):
    jobs = _jobs(spark)
    order = sorted(jobs, key=lambda j: (j[1] * 1000000 // j[3], j[0]))
    t = 0
    obj = 0
    for job, p, due, w in order:
        t += p
        obj += w * t
    t = 0
    fifo = 0
    for job, p, due, w in sorted(jobs):
        t += p
        fifo += w * t
    row = QUERIES["opt_wspt_smith_rule"](spark, SF).first()
    assert row["n_jobs"] == len(jobs)
    assert row["wspt_weighted_completion"] == obj
    assert row["fifo_weighted_completion"] == fifo
    assert abs(row["fifo_ratio"] - fifo / obj) < 1e-6
    assert fifo >= obj  # Smith's rule is optimal


def test_vickrey_replay(spark):
    rows = table(spark, SF, "lineitem").selectExpr(
        "l_partkey AS lot",
        "CAST(ROUND(l_extendedprice*100) AS LONG) AS bid",
        "l_orderkey",
        "l_linenumber",
    ).collect()
    lots = {}
    for r in rows:
        lots.setdefault(r["lot"], []).append(
            (-r["bid"], r["l_orderkey"], r["l_linenumber"])
        )
    tops, seconds, nb = [], [], 0
    n_lots = 0
    for lot, bs in lots.items():
        if len(bs) < 2:
            continue
        bs.sort()
        n_lots += 1
        nb += len(bs)
        tops.append(-bs[0][0])
        seconds.append(-bs[1][0])
    row = QUERIES["model_vickrey_second_price"](spark, SF).first()
    assert row["n_auctions"] == n_lots
    assert row["n_bids"] == nb
    assert abs(row["first_price_revenue"] - sum(tops) / 100) < 1e-6
    assert abs(row["vickrey_revenue"] - sum(seconds) / 100) < 1e-6
    assert abs(row["revenue_ratio"] - sum(seconds) / sum(tops)) < 1e-6
    assert (
        abs(
            row["mean_winner_surplus"]
            - (sum(tops) - sum(seconds)) / n_lots / 100
        )
        < 1e-6
    )
    assert 0 < row["revenue_ratio"] <= 1
