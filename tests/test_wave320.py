"""Wave-320: Cuzick T vs a midrank replay (plus the Wilcoxon reduction);
sign test vs a daily comparison walk."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cuzick_matches_midrank_replay(spark):
    row = QUERIES["agg_cuzick_trend"](spark, SF).first()
    data = [
        (int(r["o_orderpriority"][0]), int(round(r["o_totalprice"] * 100)))
        for r in table(spark, SF, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ]
    # midranks
    by_val = Counter(c for _, c in data)
    below = {}
    run = 0
    for v in sorted(by_val):
        below[v] = run
        run += by_val[v]
    rank = {v: below[v] + (by_val[v] + 1) / 2 for v in by_val}
    n = len(data)
    t = sum(z * rank[c] for z, c in data)
    sz = sum(z for z, _ in data)
    szz = sum(z * z for z, _ in data)
    et = sz * (n + 1) / 2
    var = (n + 1) / 12 * (n * szz - sz * sz)
    zc = (t - et) / math.sqrt(var)
    assert row["n_obs"] == n
    assert abs(row["z_cuzick"] - zc) < 1e-4
    assert row["monotone_trend"] == (abs(zc) > 1.959964)


def test_sign_test_matches_daily_walk(spark):
    row = QUERIES["agg_sign_test"](spark, SF).first()
    days = defaultdict(lambda: [0, 0])
    for r in table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type"
    ).collect():
        if r["event_type"] == "view":
            days[r["d"]][0] += 1
        elif r["event_type"] == "click":
            days[r["d"]][1] += 1
    plus = sum(1 for v, c in days.values() if v > c)
    minus = sum(1 for v, c in days.values() if v < c)
    ties = sum(1 for v, c in days.values() if v == c)
    assert (row["n_plus"], row["n_minus"], row["n_ties"]) == (plus, minus, ties)
    m = plus + minus
    z = (plus - m / 2) / math.sqrt(m / 4)
    assert abs(row["z_sign"] - z) < 1e-5
    assert row["medians_differ"] == (abs(z) > 1.959964)
    # the three sign classes partition the days
    assert plus + minus + ties == len(days)
