"""Wave-222: power-divergence triple vs python recomputes and the
family-agreement property on a healthy table."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_power_divergence_recompute(spark):
    row = QUERIES["agg_power_divergence"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "event_type").collect()
    cells = Counter()
    for r in ev:
        dow = (r["ts"].date().isoweekday() % 7) + 1
        cells[(dow, r["event_type"])] += 1
    n = sum(cells.values())
    rt, ct = Counter(), Counter()
    for (d, t), o in cells.items():
        rt[d] += o
        ct[t] += o
    pearson = g = ft = 0.0
    for (d, t), o in cells.items():
        e = rt[d] * ct[t] / n
        pearson += (o - e) ** 2 / e
        g += o * math.log(o / e)
        ft += (math.sqrt(o) - math.sqrt(e)) ** 2
    g *= 2
    ft *= 4
    assert row["n"] == n
    assert row["dof"] == (len(rt) - 1) * (len(ct) - 1)
    assert abs(row["pearson_x2"] - pearson) < 1e-4
    assert abs(row["g_stat"] - g) < 1e-4
    assert abs(row["freeman_tukey"] - ft) < 1e-4
    # family agreement on a table with healthy expected counts: the three
    # statistics approximate the same chi-square and sit within 20% of
    # each other
    stats = [row["pearson_x2"], row["g_stat"], row["freeman_tukey"]]
    assert max(stats) < 1.2 * min(stats) + 1.0
