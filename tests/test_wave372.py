"""Wave-372 independent replays: German tank estimators recomputed in pure
Python from the raw serials; Vargha-Delaney A recomputed by brute-force
pair counting (P(X>Y) + half-ties) on the raw values — neither replay
shares the midrank/moment algebra with the builders or their oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_german_tank_replay(spark):
    serials = [
        r[0]
        for r in table(spark, SF, "orders")
        .where(F.col("o_orderkey") % 97 == 3)
        .select("o_orderkey")
        .collect()
    ]
    k, m, tot = len(serials), max(serials), sum(serials)
    row = QUERIES["model_german_tank"](spark, SF).collect()[0]
    assert row["n_observed"] == k and row["max_serial"] == m
    assert row["mvue"] == round(m * (k + 1) / k - 1, 4)
    assert row["mom"] == round(2 * tot / k - 1, 4)
    assert row["median_unbiased"] == round(m + m * math.log(2) / k, 4)
    assert row["ci95_upper"] == round(m * 20 ** (1 / k), 4)
    # sanity: every estimator bounds below the (unknown) population max
    # from the sample max side, and MVUE >= sample max always
    assert row["mvue"] >= m - 1


def test_vargha_delaney_bruteforce_pairs(spark):
    rows = (
        table(spark, SF, "events")
        .select(
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("g"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    xs = sorted(r["v"] for r in rows if r["g"] == 1)
    ys = sorted(r["v"] for r in rows if r["g"] == 0)
    # brute-force via sorted merge (exact, no midranks): for each x count
    # #y < x and #y == x with bisect
    import bisect

    wins = ties = 0
    for x in xs:
        lo = bisect.bisect_left(ys, x)
        hi = bisect.bisect_right(ys, x)
        wins += lo
        ties += hi - lo
    a = (wins + 0.5 * ties) / (len(xs) * len(ys))
    got = QUERIES["agg_vargha_delaney_a"](spark, SF).collect()[0]
    assert got["n_weekend"] == len(xs) and got["n_weekday"] == len(ys)
    # query output is ROUND(a, 6); replay is full precision
    assert abs(got["a_measure"] - a) < 5.1e-7
    assert abs(got["rank_biserial"] - (2 * a - 1)) < 1.1e-6
    band = abs(a - 0.5)
    want = (
        "negligible"
        if band < 0.06
        else "small" if band < 0.14 else "medium" if band < 0.21 else "large"
    )
    assert got["magnitude"] == want
