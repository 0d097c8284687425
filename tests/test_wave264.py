"""Wave-264: 2x2 risk measures vs a counting replay (plus the panel's
internal identities RD = r1-r0, NNT = 1/|RD|, CI brackets RR), Kupiec
vs a python order-statistic replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_risk_measures_replay(spark):
    row = QUERIES["agg_risk_measures_2x2"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "CAST(dayofweek(ts) IN (1, 7) AS INT) AS exp",
        "CAST(event_type = 'error' AS INT) AS bad",
    ).collect()
    a = sum(1 for r in ev if r.exp and r.bad)
    b = sum(1 for r in ev if r.exp and not r.bad)
    c = sum(1 for r in ev if not r.exp and r.bad)
    d = sum(1 for r in ev if not r.exp and not r.bad)
    r1, r0 = a / (a + b), c / (c + d)
    rr = r1 / r0
    se = math.sqrt(b / (a * (a + b)) + d / (c * (c + d)))
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    assert abs(row.risk_exposed - round(r1, 6)) < 1e-9
    assert abs(row.risk_unexposed - round(r0, 6)) < 1e-9
    assert abs(row.relative_risk - round(rr, 6)) < 1e-6
    assert abs(row.risk_difference - round(r1 - r0, 6)) < 1e-9
    if r1 != r0:
        assert abs(row.nnt - round(1 / abs(r1 - r0), 6)) < 1e-3
    assert abs(row.rr_ci_lo - round(rr * math.exp(-1.959964 * se), 6)) < 1e-5
    assert abs(row.rr_ci_hi - round(rr * math.exp(1.959964 * se), 6)) < 1e-5
    assert row.rr_ci_lo <= row.relative_risk <= row.rr_ci_hi


def test_var_backtest_replay(spark):
    row = QUERIES["events_var_backtest_kupiec"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "value"
    ).collect()
    acc = defaultdict(list)
    for r in ev:
        acc[r.h].append(r.value)
    x = [sum(v) / len(v) for _, v in sorted(acc.items())]
    rets = [b - a for a, b in zip(x, x[1:])]
    n = len(x)
    half = n // 2
    # returns carry index t = 2..n; train is t <= half
    train = [r for t, r in enumerate(rets, start=2) if t <= half]
    test = [r for t, r in enumerate(rets, start=2) if t > half]
    sv = sorted(train)
    var_lo = sv[math.ceil(len(sv) * 0.05) - 1]
    xv = sum(1 for r in test if r < var_lo)
    nt = len(test)
    p = xv / nt
    lr = -2 * (
        (nt - xv) * math.log(0.95)
        + xv * math.log(0.05)
        - (nt - xv) * math.log(1 - p)
        - xv * math.log(p)
    )
    assert row.n_test == nt
    assert row.n_violations == xv
    assert abs(row.var_threshold - round(var_lo, 6)) < 1e-9
    assert abs(row.violation_rate - round(p, 6)) < 1e-9
    assert abs(row.kupiec_lr - round(lr, 6)) < 1e-4
    assert bool(row.var_rejected) == (lr > 3.841459)
    assert row.kupiec_lr >= 0
