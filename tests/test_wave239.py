"""Wave-239: Brunner-Munzel vs a per-observation midrank replay (the
engine works on the grouped distinct-value frame — this replay ranks raw
observations, an independent construction), Ansari-Bradley vs a
per-position score replay."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _samples(spark):
    rows = (
        table(spark, SF, "events")
        .where("event_type IN ('view','click')")
        .select("event_type", "value")
        .collect()
    )
    x = [r.value for r in rows if r.event_type == "view"]
    y = [r.value for r in rows if r.event_type == "click"]
    return x, y


def _midranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = mid
        i = j
    return ranks


def test_brunner_munzel_replay(spark):
    row = QUERIES["agg_brunner_munzel"](spark, SF).collect()[0]
    x, y = _samples(spark)
    n1, n2 = len(x), len(y)
    comb = _midranks(x + y)
    rx_all, ry_all = comb[:n1], comb[n1:]
    rx, ry = sum(rx_all) / n1, sum(ry_all) / n2
    wx, wy = _midranks(x), _midranks(y)
    v1 = sum((r - w - rx + (n1 + 1) / 2) ** 2 for r, w in zip(rx_all, wx)) / (n1 - 1)
    v2 = sum((r - w - ry + (n2 + 1) / 2) ** 2 for r, w in zip(ry_all, wy)) / (n2 - 1)
    stat = n1 * n2 * (ry - rx) / (n1 + n2) / math.sqrt(n1 * v1 + n2 * v2)
    df = (n1 * v1 + n2 * v2) ** 2 / (
        (n1 * v1) ** 2 / (n1 - 1) + (n2 * v2) ** 2 / (n2 - 1)
    )
    p_hat = (ry - (n2 + 1) / 2) / n1
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.p_hat - round(p_hat, 6)) < 1e-6
    assert abs(row.bm_stat - round(stat, 6)) < 1e-4
    assert abs(row.df - round(df, 6)) < 0.01
    assert 0 < row.p_hat < 1
    # df is Welch-like: bounded by the two marginal dfs
    assert min(n1, n2) - 1 <= row.df <= n1 + n2 - 2


def test_ansari_bradley_replay(spark):
    row = QUERIES["agg_ansari_bradley"](spark, SF).collect()[0]
    x, y = _samples(spark)
    n1, n2 = len(x), len(y)
    nn = n1 + n2
    vals = x + y
    # per-position min(p, N+1-p) averaged over each tie block
    order = sorted(range(nn), key=lambda i: vals[i])
    score = [0.0] * nn
    i = 0
    while i < nn:
        j = i
        while j < nn and vals[order[j]] == vals[order[i]]:
            j += 1
        block = [min(p + 1, nn - p) for p in range(i, j)]
        mean_s = sum(block) / len(block)
        for k in range(i, j):
            score[order[k]] = mean_s
        i = j
    ab = sum(score[:n1])
    abar = sum(score) / nn
    a2bar = sum(s * s for s in score) / nn
    var = n1 * (nn - n1) / (nn - 1) * (a2bar - abar * abar)
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.ab_stat - round(ab, 6)) < 1e-4
    assert abs(row.e_ab - round(n1 * abar, 6)) < 1e-4
    assert abs(row.z - round((ab - n1 * abar) / math.sqrt(var), 6)) < 1e-4
