"""Wave-301: Geary's C vs a python grid replay (and the Moran duality on
the same weights); Lotka fit vs a Counter-of-Counters replay."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _grid(spark):
    cells = {}
    agg = Counter()
    cnt = Counter()
    for r in (
        table(spark, SF, "events")
        .selectExpr("hour(ts) AS h", "dayofweek(ts) AS d", "value")
        .collect()
    ):
        agg[(r["h"], r["d"])] += r["value"]
        cnt[(r["h"], r["d"])] += 1
    for k in agg:
        cells[k] = agg[k] / cnt[k]
    return cells


def test_geary_c_matches_grid_replay(spark):
    row = QUERIES["agg_geary_c"](spark, SF).first()
    cells = _grid(spark)
    keys = list(cells)
    n = len(keys)
    xbar = sum(cells.values()) / n
    adj = [
        (a, b)
        for a in keys
        for b in keys
        if a != b and abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1
    ]
    s0 = len(adj)
    num = sum((cells[a] - cells[b]) ** 2 for a, b in adj)
    den = sum((x - xbar) ** 2 for x in cells.values())
    c = (n - 1) * num / (2 * s0 * den)
    deg = Counter(a for a, _ in adj)
    s2 = sum(4 * k * k for k in deg.values())
    var = ((2 * (2 * s0) + s2) * (n - 1) - 4 * s0 * s0) / (2 * (n + 1) * s0 * s0)
    z = (c - 1) / math.sqrt(var)
    assert row["n_cells"] == n and row["s0"] == s0
    assert abs(row["geary_c"] - c) < 1e-5
    assert abs(row["z_norm"] - z) < 1e-4
    assert row["positive_autocorr"] == (c < 1)
    assert row["geary_c"] >= 0


def test_lotka_matches_counter_replay(spark):
    row = QUERIES["model_lotka_law"](spark, SF).first()
    per_user = Counter(
        r["user_id"] for r in table(spark, SF, "events").select("user_id").collect()
    )
    fof = Counter(per_user.values())
    pts = [(math.log(n), math.log(f)) for n, f in fof.items()]
    m = len(pts)
    mx = sum(x for x, _ in pts) / m
    my = sum(y for _, y in pts) / m
    sxx = sum(x * x for x, _ in pts) - m * mx * mx
    syy = sum(y * y for _, y in pts) - m * my * my
    sxy = sum(x * y for x, y in pts) - m * mx * my
    assert row["n_users"] == len(per_user)
    assert row["n_distinct_counts"] == m
    assert abs(row["lotka_alpha"] - (-sxy / sxx)) < 1e-5
    assert abs(row["loglog_r2"] - sxy * sxy / (sxx * syy)) < 1e-5
    assert abs(row["frac_singletons"] - fof.get(1, 0) / len(per_user)) < 1e-6
    assert 0 <= row["loglog_r2"] <= 1
