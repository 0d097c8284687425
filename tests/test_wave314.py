"""Wave-314: Hawkes branching vs a python Fano replay (plus the clamp
semantics); LFU hit ladder vs a sorted-popularity replay and its
monotonicity."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_hawkes_branching_matches_fano_replay(spark):
    row = QUERIES["events_hawkes_branching"](spark, SF).first()
    hours = Counter(
        r["h"]
        for r in table(spark, SF, "events")
        .selectExpr("date_trunc('hour', ts) AS h")
        .collect()
    )
    xs = list(hours.values())
    n = len(xs)
    mean = sum(xs) / n
    fano = (sum(x * x for x in xs) / n - mean * mean) / mean
    nb = max(0.0, 1 - 1 / math.sqrt(max(fano, 1.0)))
    assert row["n_hours"] == n
    assert row["n_events"] == sum(xs)
    assert abs(row["fano_factor"] - fano) < 1e-4
    assert abs(row["branching_ratio"] - nb) < 1e-5
    assert abs(row["exogenous_fraction"] - (1 - nb)) < 1e-5
    assert row["self_exciting"] == (fano > 1)
    # branching ratio lives in [0, 1); inverting it recovers the Fano
    assert 0 <= row["branching_ratio"] < 1
    if row["branching_ratio"] > 0:
        assert abs(1 / (1 - nb) ** 2 - fano) < 1e-3 * fano


def test_lfu_hit_ladder_matches_popularity_replay(spark):
    row = QUERIES["events_cache_lfu_hit"](spark, SF).first()
    pop = Counter(
        r["user_id"] for r in table(spark, SF, "events").select("user_id").collect()
    )
    ranked = sorted(pop.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(pop.values())
    assert row["n_items"] == len(pop)
    assert row["n_requests"] == total
    for cz in (10, 50, 100):
        expect = sum(c for _, c in ranked[:cz]) / total
        assert abs(row[f"hit_at_{cz}"] - expect) < 1e-6
    # Zipf fit replay on (ln rank, ln count)
    pts = [(math.log(i + 1), math.log(c)) for i, (_, c) in enumerate(ranked)]
    m = len(pts)
    mx = sum(x for x, _ in pts) / m
    my = sum(y for _, y in pts) / m
    sxx = sum(x * x for x, _ in pts) - m * mx * mx
    sxy = sum(x * y for x, y in pts) - m * mx * my
    assert abs(row["zipf_alpha"] - (-sxy / sxx)) < 1e-4
    # the ladder is monotone and bounded by 1
    assert 0 < row["hit_at_10"] <= row["hit_at_50"] <= row["hit_at_100"] <= 1
