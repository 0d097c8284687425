"""Wave-383 pytests: seasonal Mann-Kendall + BFS double-sweep diameter.

Independent replay: the Hirsch-Slack statistic is recomputed in pure
Python from the daily counts (pair loop + tie correction, no SQL), and
the double-sweep bound is checked against a from-scratch Python BFS over
the collected edge set.
"""

from __future__ import annotations

import math
from collections import defaultdict, deque

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_seasonal_kendall_matches_pure_python(spark):
    row = QUERIES["events_seasonal_kendall"](spark, SF).first()
    daily = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), F.weekday("ts").alias("dow"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    seasons: dict[int, list[tuple]] = defaultdict(list)
    for r in daily:
        seasons[r["dow"]].append((r["day"], r["c"]))
    s_total = 0
    var18 = 0
    n_days = 0
    for _dow, series in seasons.items():
        series.sort()
        n = len(series)
        n_days += n
        for i in range(n):
            for j in range(i + 1, n):
                d = series[j][1] - series[i][1]
                s_total += (d > 0) - (d < 0)
        var18 += n * (n - 1) * (2 * n + 5)
        ties: dict[int, int] = defaultdict(int)
        for _day, c in series:
            ties[c] += 1
        for t in ties.values():
            if t > 1:
                var18 -= t * (t - 1) * (2 * t + 5)
    assert row["n_seasons"] == len(seasons)
    assert row["n_days"] == n_days
    assert row["s_total"] == s_total
    assert row["var18_total"] == var18
    if var18 > 0 and s_total != 0:
        z = (s_total - (1 if s_total > 0 else -1)) / math.sqrt(var18 / 18.0)
        assert abs(row["z_sk"] - round(z, 6)) <= 1e-6


def test_double_sweep_matches_python_bfs(spark):
    row = QUERIES["graph_diameter_double_sweep"](spark, SF).first()
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    orders: dict[int, set[int]] = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    pair_orders: dict[tuple, set] = defaultdict(set)
    for ok, parts in orders.items():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])].add(ok)
    adj: dict[int, set[int]] = defaultdict(set)
    for (u, v), oks in pair_orders.items():
        if len(oks) >= 2:
            adj[u].add(v)
            adj[v].add(u)
    if not adj:
        return  # sf too small to form the >=2-order graph

    def bfs(src: int, cap: int = 8) -> dict[int, int]:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] >= cap:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return dist

    s = min(adj)
    d1 = bfs(s)
    far = max(d1.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    d2 = bfs(far)
    assert row["source_node"] == s
    assert row["far_node"] == far
    assert row["first_sweep_depth"] == d1[far]
    assert row["diameter_lower_bound"] == max(d2.values())
    assert row["n_reached_1"] == len(d1)
    assert row["n_reached_2"] == len(d2)
    # double-sweep invariant: second sweep's eccentricity >= first depth
    assert row["diameter_lower_bound"] >= row["first_sweep_depth"]
