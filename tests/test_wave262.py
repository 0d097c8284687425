"""Wave-262: R_t vs a convolution replay (plus the renewal identity:
constant incidence gives R_t == 1 exactly under a normalized kernel),
growth fit vs a numpy polyfit replay."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
W = [0.25, 0.3125, 0.25, 0.125, 0.0625]


def _daily_counts(spark):
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    per = defaultdict(int)
    for r in ev:
        per[r.d] += 1
    return [v for _, v in sorted(per.items())]


def test_rt_cori_replay(spark):
    rows = sorted(QUERIES["events_rt_cori"](spark, SF).collect(), key=lambda r: r.day)
    y = _daily_counts(spark)
    expect = []
    for t in range(len(y)):
        if t < 5:
            continue
        lam = sum(w * y[t - 1 - k] for k, w in enumerate(W))
        if lam > 0:
            expect.append((y[t], lam, y[t] / lam))
    assert len(rows) == len(expect)
    for r, (inc, lam, rt) in zip(rows, expect):
        assert r.incidence == inc
        assert abs(r.lambda_t - round(lam, 6)) < 1e-9
        assert abs(r.r_t - round(rt, 6)) < 1e-9
        assert bool(r.growing) == (rt > 1.0)
    # the kernel is normalized: sum(W) == 1 exactly (dyadic rationals)
    assert sum(W) == 1.0
    # renewal identity on a synthetic flat curve
    flat = [100] * 12
    for t in range(5, 12):
        lam = sum(w * flat[t - 1 - k] for k, w in enumerate(W))
        assert abs(flat[t] / lam - 1.0) < 1e-12


def test_epidemic_growth_replay(spark):
    row = QUERIES["events_epidemic_growth"](spark, SF).collect()[0]
    y = _daily_counts(spark)
    pts = [(t + 1, math.log(v)) for t, v in enumerate(y[:10]) if v > 0]
    ts = np.array([p[0] for p in pts], dtype=float)
    ly = np.array([p[1] for p in pts])
    r, _b = np.polyfit(ts, ly, 1)
    assert row.n_days_fit == len(pts)
    assert abs(row.growth_rate - round(float(r), 6)) < 1e-5
    if r > 0:
        assert abs(row.doubling_days - round(math.log(2) / r, 6)) < 1e-3
    else:
        assert row.doubling_days == -1.0
    assert abs(row.r0_sir - round(1 + r * 7, 6)) < 1e-4
    assert abs(row.daily_multiplier - round(math.exp(r), 6)) < 1e-5
