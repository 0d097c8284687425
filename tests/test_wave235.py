"""Wave-235: variance ratio, ARCH LM, and cosinor vs pure-python/numpy
recomputes (numpy lstsq for the regressions — an independent solver)."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
Q = 12


def _hourly(spark):
    rows = (
        table(spark, SF, "events")
        .selectExpr("unix_micros(ts) div 3600000000 AS hidx", "value")
        .collect()
    )
    acc = {}
    for r in rows:
        acc.setdefault(r.hidx, []).append(r.value)
    return [sum(v) / len(v) for _, v in sorted(acc.items())]


def test_variance_ratio_replay(spark):
    row = QUERIES["events_variance_ratio"](spark, SF).collect()[0]
    x = _hourly(spark)
    n = len(x)
    m = n - 1
    r1 = [x[t] - x[t - 1] for t in range(1, n)]
    mu = sum(r1) / m
    var1 = sum((r - mu) ** 2 for r in r1) / m
    rq = [x[t] - x[t - Q] for t in range(Q, n)]
    varq = sum((r - Q * mu) ** 2 for r in rq) / (m * Q)
    vr = varq / var1
    z = math.sqrt(m) * (vr - 1) / math.sqrt(2 * (2 * Q - 1) * (Q - 1) / (3 * Q))
    assert row.n_returns == m
    assert abs(row.var1 - round(var1, 6)) < 1e-5
    assert abs(row.varq - round(varq, 6)) < 1e-5
    assert abs(row.vr - round(vr, 6)) < 1e-5
    assert abs(row.z_homo - round(z, 6)) < 1e-4


def test_arch_lm_replay(spark):
    row = QUERIES["events_arch_lm"](spark, SF).collect()[0]
    x = np.array(_hourly(spark))
    y = (x - x.mean()) ** 2
    yy, y1, y2 = y[2:], y[1:-1], y[:-2]
    X = np.column_stack([np.ones_like(yy), y1, y2])
    beta, *_ = np.linalg.lstsq(X, yy, rcond=None)
    resid = yy - X @ beta
    r2 = 1 - resid @ resid / ((yy - yy.mean()) @ (yy - yy.mean()))
    t = len(yy)
    assert row.t_obs == t
    assert abs(row.r2 - round(float(r2), 6)) < 1e-5
    assert abs(row.lm_stat - round(float(t * r2), 6)) < 1e-3
    assert bool(row.arch_present) == bool(t * r2 > 5.991465)


def test_cosinor_replay(spark):
    row = QUERIES["events_cosinor"](spark, SF).collect()[0]
    rows = (
        table(spark, SF, "events")
        .selectExpr(
            "CAST(unix_micros(ts) % 86400000000 AS DOUBLE) / 3600000000.0 AS tod",
            "value",
        )
        .collect()
    )
    t = np.array([r.tod for r in rows])
    y = np.array([r.value for r in rows])
    w = 2 * math.pi / 24
    X = np.column_stack([np.ones_like(t), np.cos(w * t), np.sin(w * t)])
    (mesor, a, b), *_ = np.linalg.lstsq(X, y, rcond=None)
    amp = math.hypot(a, b)
    acro = (math.atan2(b, a) / w) % 24
    assert row.n_events == len(rows)
    assert abs(row.mesor - round(float(mesor), 6)) < 1e-5
    assert abs(row.amplitude - round(float(amp), 6)) < 1e-5
    assert abs(row.acrophase_h - round(acro, 6)) < 1e-4
    assert 0 <= row.acrophase_h < 24
