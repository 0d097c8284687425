"""Wave-290: Tukey additivity vs a numpy decomposition replay (plus the
orthogonality identity: SS_nonadd <= SS_resid), madogram vs a lag-sweep
replay with the fractal-dimension bracket."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_tukey_additivity_replay(spark):
    row = QUERIES["agg_tukey_additivity"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "event_type AS r", "dayofweek(ts) AS c", "value"
    ).collect()
    acc = defaultdict(list)
    for e in ev:
        acc[(e.r, e.c)].append(e.value)
    cells = {k: sum(v) / len(v) for k, v in acc.items()}
    rs = sorted({k[0] for k in cells})
    cs = sorted({k[1] for k in cells})
    y = np.array([[cells[(r, c)] for c in cs] for r in rs])
    g = y.mean()
    a = y.mean(axis=1) - g
    b = y.mean(axis=0) - g
    resid = y - g - a[:, None] - b[None, :]
    sab = float((resid * a[:, None] * b[None, :]).sum())
    ss_nonadd = sab * sab / (float((a * a).sum()) * float((b * b).sum()))
    ss_resid = float((resid * resid).sum())
    f = ss_nonadd / ((ss_resid - ss_nonadd) / (35 - 5 - 7))
    assert row.n_cells == 35
    assert abs(row.ss_nonadd - round(ss_nonadd, 6)) < 1e-5
    assert abs(row.ss_resid - round(ss_resid, 6)) < 1e-5
    assert abs(row.f_stat - round(f, 6)) < 1e-3
    assert bool(row.non_additive) == (f > 4.279344)
    # the 1-df component is part of the residual SS
    assert row.ss_nonadd <= row.ss_resid + 1e-9


def test_madogram_replay(spark):
    rows = {r.lag_h: r for r in QUERIES["events_madogram"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "value"
    ).collect()
    acc = defaultdict(list)
    for r in ev:
        acc[r.h].append(r.value)
    xs = [sum(v) / len(v) for _, v in sorted(acc.items())]
    mado = {}
    for k in (1, 2, 4, 8, 24):
        d = [abs(xs[i + k] - xs[i]) for i in range(len(xs) - k)]
        r = rows[k]
        assert r.n_pairs == len(d)
        assert abs(r.madogram - round(sum(d) / len(d), 6)) < 1e-6
        mado[k] = sum(d) / len(d)
    # fractal dimension from the log-log slope: D = 2 - slope, in (0.5, 2.5)
    lx = np.log([1, 2, 4, 8, 24])
    ly = np.log([mado[k] for k in (1, 2, 4, 8, 24)])
    slope = float(np.polyfit(lx, ly, 1)[0])
    d_frac = 2 - slope
    assert 0.5 < d_frac < 2.5
    # structure functions are non-decreasing-ish at short lags for
    # positively correlated series; at minimum they stay positive
    assert all(v > 0 for v in mado.values())
