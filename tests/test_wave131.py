"""Wave-131 semantics: partition pruning, KWIC structure, Kleinberg
reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_hive_partitioned_prunes_partitions(spark):
    df = QUERIES["source_hive_partitioned"](spark, SF)
    rows = df.collect()
    assert rows and all(r["y"] == 1995 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "1995" in plan.split("PartitionFilters")[1].split("]")[0]


def test_kwic_contexts_match_documents(spark):
    rows = QUERIES["text_concordance_kwic"](spark, SF).collect()
    assert rows
    texts = {
        r["doc_id"]: r["text"].split(" ")
        for r in table(spark, SF, "documents").collect()
    }
    kws = {r["kw"] for r in rows}
    assert len(kws) == 1  # single global target token
    for r in rows[:50]:
        toks = texts[r["doc_id"]]
        p = r["p"]
        assert toks[p - 1] == r["kw"]
        assert r["left_ctx"] == " ".join(toks[max(0, p - 4) : p - 1])
        assert r["right_ctx"] == " ".join(toks[p : p + 3])


def test_kleinberg_gap_assembly_is_jvm_side(spark):
    # r11: gap series are assembled with sort_array(collect_list) in the
    # JVM and only one row per series crosses the Python boundary — the
    # per-group pandas path (FlatMapGroupsInPandas) must stay gone
    df = QUERIES["events_burst_kleinberg"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_kleinberg_matches_python(spark):
    rows = {r["event_type"]: r for r in QUERIES["events_burst_kleinberg"](spark, SF).collect()}
    assert rows
    raw = (
        table(spark, SF, "events")
        .select("event_type", "user_id", "event_id", F.unix_millis("ts").alias("ms"))
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in raw:
        series[(r["event_type"], r["user_id"])].append((r["ms"], r["event_id"]))
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_series, n_gaps, cost, nb_sum
    mx = defaultdict(int)
    for (et, _u), evs in series.items():
        evs.sort()
        ts = [m for m, _ in evs]
        if len(ts) < 2:
            continue
        x = [b - a for a, b in zip(ts, ts[1:])]
        n, tspan = len(x), sum(x)
        if tspan <= 0:
            continue
        c0 = [math.floor(1e6 * ((xi * n) / tspan - math.log(n * 1e0 / tspan)) + 0.5) for xi in x]
        c1 = [math.floor(1e6 * (2.0 * (xi * n) / tspan - math.log(2.0 * n / tspan)) + 0.5) for xi in x]
        g = round(1e6 * math.log(float(n)))
        d0, d1 = c0[0], c1[0] + g
        nb = 1 if d1 < d0 else 0
        for t in range(1, n):
            d0, d1 = c0[t] + min(d0, d1), c1[t] + min(d0 + g, d1)
            if d1 < d0:
                nb += 1
        a = agg[et]
        a[0] += 1
        a[1] += n
        a[2] += min(d0, d1)
        a[3] += nb
        mx[et] = max(mx[et], nb)
    for et, r in rows.items():
        assert r["n_series"] == agg[et][0]
        assert r["n_gaps"] == agg[et][1]
        assert r["total_cost_micro"] == agg[et][2]
        assert r["n_burst_steps"] == agg[et][3]
        assert r["max_burst_steps"] == mx[et]
