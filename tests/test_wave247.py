"""Wave-247: seasonal MK vs a per-season pairwise python replay (plus the
season-decomposition identity S_total = sum of per-season S), power-law
alpha vs a from-scratch CSN MLE replay on the degree list."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
GRAPH_SF = "/root/testdata/sf0.01"  # sf0.001's co-occurrence graph is empty


def test_seasonal_mann_kendall_replay(spark):
    row = QUERIES["events_seasonal_mann_kendall"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "hour(ts) AS h", "CAST(ts AS DATE) AS day", "value"
    ).collect()
    acc = defaultdict(lambda: defaultdict(list))
    for r in ev:
        acc[r.h][r.day].append(r.value)
    s_total, var_total, n_seasons = 0, 0.0, 0
    for h, days in acc.items():
        series = [sum(v) / len(v) for _, v in sorted(days.items())]
        n = len(series)
        n_seasons += 1
        for i in range(n):
            for j in range(i + 1, n):
                s_total += (series[j] > series[i]) - (series[j] < series[i])
        var_total += n * (n - 1) * (2 * n + 5) / 18.0
    if s_total > 0:
        z = (s_total - 1) / math.sqrt(var_total)
    elif s_total < 0:
        z = (s_total + 1) / math.sqrt(var_total)
    else:
        z = 0.0
    assert row.s_total == s_total
    assert row.n_seasons == n_seasons
    assert abs(row.var_total - round(var_total, 6)) < 1e-6
    assert abs(row.z - round(z, 6)) < 1e-6
    assert bool(row.trend_detected) == (abs(z) > 1.959964)


def test_powerlaw_alpha_replay(spark):
    row = QUERIES["graph_powerlaw_alpha"](spark, GRAPH_SF).collect()[0]
    ev = table(spark, GRAPH_SF, "events").selectExpr(
        "user_id", "event_type", "date_trunc('minute', ts) AS m"
    ).collect()
    buckets = defaultdict(set)
    for r in ev:
        buckets[(r.event_type, r.m)].add(r.user_id)
    edges = set()
    for users in buckets.values():
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                edges.add((us[i], us[j]))
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    tail = [k for k in deg.values() if k >= 2]
    n = len(tail)
    alpha = 1.0 + n / sum(math.log(k / 1.5) for k in tail)
    assert row.n_tail == n
    assert row.max_k == max(tail)
    assert abs(row.alpha - round(alpha, 6)) < 1e-5
    # KS distance replay on the tail CCDF
    byk = defaultdict(int)
    for k in tail:
        byk[k] += 1
    ks = 0.0
    seen = 0
    for k in sorted(byk, reverse=True):
        seen += byk[k]
        emp = seen / n
        fitted = math.exp((1 - alpha) * math.log((k - 0.5) / 1.5))
        ks = max(ks, abs(emp - fitted))
    assert abs(row.ks_d - round(ks, 6)) < 1e-5
    assert row.alpha > 1  # MLE is only defined above 1
    assert 0 <= row.ks_d <= 1
