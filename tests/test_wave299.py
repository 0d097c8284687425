"""Wave-299: Blomqvist quadrant counts vs a python median/quadrant replay;
turning points vs a direct series walk."""

from __future__ import annotations

import math
import statistics
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_blomqvist_matches_quadrant_replay(spark):
    row = QUERIES["agg_blomqvist_beta"](spark, SF).first()
    pts = [
        (int(r["l_quantity"]), int(round(r["l_extendedprice"] * 100)))
        for r in table(spark, SF, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .collect()
    ]
    # the query's median = low median (rank (n+1)//2 order statistic)
    mx = statistics.median_low(sorted(x for x, _ in pts))
    my = statistics.median_low(sorted(y for _, y in pts))
    conc = sum(1 for x, y in pts if x != mx and y != my and (x > mx) == (y > my))
    disc = sum(1 for x, y in pts if x != mx and y != my and (x > mx) != (y > my))
    assert row["n_concordant"] == conc
    assert row["n_discordant"] == disc
    beta = (conc - disc) / (conc + disc)
    assert abs(row["blomqvist_beta"] - beta) < 1e-6
    assert abs(row["z_beta"] - beta * math.sqrt(conc + disc)) < 1e-5
    assert -1 <= row["blomqvist_beta"] <= 1


def test_turning_points_match_series_walk(spark):
    row = QUERIES["events_turning_points"](spark, SF).first()
    days = Counter(
        r["d"]
        for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    )
    xs = [days[d] for d in sorted(days)]
    n = len(xs)
    turns = sum(
        1
        for i in range(1, n - 1)
        if (xs[i - 1] < xs[i] > xs[i + 1]) or (xs[i - 1] > xs[i] < xs[i + 1])
    )
    assert row["n_days"] == n
    assert row["n_turning_points"] == turns
    e = 2 * (n - 2) / 3
    z = (turns - e) / math.sqrt((16 * n - 29) / 90)
    assert abs(row["expected_turns"] - e) < 1e-6
    assert abs(row["z_turns"] - z) < 1e-6
    assert row["nonrandom"] == (abs(z) > 1.959964)
    # a strict local max/min cannot occur at more than every other point
    assert turns <= n - 2
