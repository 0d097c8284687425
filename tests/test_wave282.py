"""Wave-282: Bates-Granger vs a moments replay (plus the theorem: the
optimal blend never loses to the best single forecaster), shorth vs a
sorted-sweep replay (plus the coverage property: the interval holds at
least half the points)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    return [sum(v) / len(v) for _, v in sorted(per.items())]


def test_bates_granger_replay(spark):
    row = QUERIES["model_bates_granger_blend"](spark, SF).collect()[0]
    ys = _daily(spark)
    e1 = [ys[i - 1] - ys[i] for i in range(7, len(ys))]
    e2 = [ys[i - 7] - ys[i] for i in range(7, len(ys))]
    n = len(e1)
    v1 = sum(x * x for x in e1) / n
    v2 = sum(x * x for x in e2) / n
    c12 = sum(a * b for a, b in zip(e1, e2)) / n
    w1 = (v2 - c12) / (v1 + v2 - 2 * c12)
    mse_c = w1 * w1 * v1 + (1 - w1) ** 2 * v2 + 2 * w1 * (1 - w1) * c12
    assert row.n_obs == n
    assert abs(row.mse_persistence - round(v1, 6)) < 1e-5
    assert abs(row.mse_seasonal - round(v2, 6)) < 1e-5
    assert abs(row.w_persistence - round(w1, 6)) < 1e-5
    assert abs(row.w_seasonal - round(1 - w1, 6)) < 1e-5
    assert abs(row.mse_combined - round(mse_c, 6)) < 1e-5
    # Bates-Granger theorem: the optimal convex blend cannot lose
    assert row.gain_vs_best_single >= -1e-6
    assert abs(row.w_persistence + row.w_seasonal - 1) < 1e-9


def test_shorth_lms_replay(spark):
    row = QUERIES["agg_shorth_lms"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "value"
    ).collect()
    acc = defaultdict(list)
    for r in ev:
        acc[r.h].append(r.value)
    # tie-break (x, hidx) matches sorting values with their hour order
    items = sorted(
        ((sum(v) / len(v), h) for h, v in sorted(acc.items())),
    )
    xs = [x for x, _h in items]
    n = len(xs)
    hh = n // 2 + 1
    best = None
    for i in range(n - hh + 1):
        width = xs[i + hh - 1] - xs[i]
        cand = (width, xs[i], xs[i + hh - 1])
        if best is None or cand < best:
            best = cand
    width, lo, hi = best
    assert row.n_obs == n and row.half_size == hh
    assert abs(row.shorth_lo - round(lo, 6)) < 1e-9
    assert abs(row.shorth_hi - round(hi, 6)) < 1e-9
    assert abs(row.lms_location - round((lo + hi) / 2, 6)) < 1e-9
    assert abs(row.lms_scale_raw - round(width / 2, 6)) < 1e-9
    # coverage: at least half the observations inside [lo, hi]
    inside = sum(1 for x in xs if lo <= x <= hi)
    assert inside >= hh
