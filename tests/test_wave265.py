"""Wave-265: Kish deff vs an IPF-then-moments replay (plus the Cauchy-
Schwarz bound deff >= 1), extremal index vs a cluster-sweep replay
(plus theta in (0, 1])."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kish_deff_replay(spark):
    row = QUERIES["model_kish_deff"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "event_type AS et", "dayofweek(ts) AS dow"
    ).collect()
    n = defaultdict(int)
    for r in ev:
        n[(r.et, r.dow)] += 1
    t = sum(n.values())
    ets = sorted({k[0] for k in n})
    dows = sorted({k[1] for k in n})
    rt, ct = t / len(ets), t / len(dows)
    w = dict(n)
    for _ in range(2):
        rs = defaultdict(float)
        for (et, dow), v in w.items():
            rs[et] += v
        w = {k: v * (rt / rs[k[0]]) for k, v in w.items()}
        cs = defaultdict(float)
        for (et, dow), v in w.items():
            cs[dow] += v
        w = {k: v * (ct / cs[k[1]]) for k, v in w.items()}
    # per-unit weights, expanded by cell counts
    s1 = sum(w[k] / n[k] * n[k] for k in n)
    s2 = sum((w[k] / n[k]) ** 2 * n[k] for k in n)
    deff = t * s2 / (s1 * s1)
    assert row.n_units == t
    assert abs(row.mean_weight - round(s1 / t, 6)) < 1e-5
    assert abs(row.deff_kish - round(deff, 6)) < 1e-5
    assert abs(row.n_effective - round(s1 * s1 / s2, 6)) < 1e-2
    assert abs(row.efficiency_loss - round(1 - (s1 * s1 / s2) / t, 6)) < 1e-5
    # Cauchy-Schwarz: unequal weights always cost, never help
    assert row.deff_kish >= 1 - 1e-9
    assert row.n_effective <= row.n_units + 1e-6


def test_extremal_index_replay(spark):
    row = QUERIES["events_extremal_index"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "value"
    ).collect()
    acc = defaultdict(list)
    for r in ev:
        acc[r.h].append(r.value)
    x = [sum(v) / len(v) for _, v in sorted(acc.items())]
    sv = sorted(x)
    u = sv[math.ceil(len(sv) * 0.95) - 1]
    exc_t = [t for t, v in enumerate(x, start=1) if v > u]
    clusters = 1
    intra = []
    for a, b in zip(exc_t, exc_t[1:]):
        if b - a > 3:
            clusters += 1
        else:
            intra.append(b - a)
    assert abs(row.threshold - round(u, 6)) < 1e-9
    assert row.n_exceedances == len(exc_t)
    assert row.n_clusters == clusters
    assert abs(row.theta_runs - round(clusters / len(exc_t), 6)) < 1e-9
    exp_gap = sum(intra) / len(intra) if intra else 0.0
    assert abs(row.mean_intra_gap_h - round(exp_gap, 6)) < 1e-9
    assert 0 < row.theta_runs <= 1
