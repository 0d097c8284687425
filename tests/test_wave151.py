"""Wave-151: optimality properties of the scheduling/knapsack rules."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_knapsack_greedy_matches_python(spark):
    r = QUERIES["opt_fractional_knapsack"](spark, SF).collect()[0]
    items = sorted(
        (
            (row["p_partkey"], round(row["p_retailprice"] * 100), row["p_size"])
            for row in table(spark, SF, "part").collect()
            if row["p_partkey"] <= 50
        ),
        key=lambda t: (-(t[1] / t[2]), t[0]),
    )
    cap, cum, val, n_full, fw, boundary = 100, 0, 0, 0, 0, None
    for pk, v, w in items:
        if cum + w <= cap:
            cum += w
            val += v * 1000000
            n_full += 1
            fw += w
        elif cum < cap:
            boundary = pk
            val += (v * (cap - cum) * 1000000) // w if (v * (cap - cum) * 1000000) % w == 0 else int(
                (v * (cap - cum) * 1000000.0) // w
            )
            cum = cap
        else:
            break
    assert r["n_full"] == n_full
    assert r["full_weight"] == fw
    assert r["boundary_part"] == boundary
    assert r["value_micro_cents"] == val


def test_spt_beats_fifo(spark):
    r = QUERIES["opt_spt_scheduling"](spark, SF).collect()[0]
    assert r["spt_total_completion"] <= r["fifo_total_completion"]
    assert r["fifo_over_spt"] >= 1.0


def test_johnson_beats_fifo_and_matches_simulation(spark):
    r = QUERIES["opt_johnson_flowshop"](spark, SF).collect()[0]
    assert r["johnson_makespan"] <= r["fifo_makespan"]
    # verify the closed form against a sequential two-machine simulation
    per = defaultdict(lambda: [0, 0])
    for row in (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        if row["event_type"] == "click":
            per[row["day"]][0] = row["x"]
        elif row["event_type"] == "purchase":
            per[row["day"]][1] = row["x"]
    jobs = [(d, m1, m2) for d, (m1, m2) in per.items()]
    johnson = sorted(
        jobs, key=lambda j: (0 if j[1] < j[2] else 1, j[1] if j[1] < j[2] else -j[2], j[0])
    )

    def makespan(seq):
        c1 = c2 = 0
        for _d, m1, m2 in seq:
            c1 += m1
            c2 = max(c2, c1) + m2
        return c2

    assert r["johnson_makespan"] == makespan(johnson)
    assert r["fifo_makespan"] == makespan(sorted(jobs))
