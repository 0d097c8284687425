"""Wave-246: CUSUM-of-squares vs a python Brownian-bridge replay, DCCA
vs a numpy polyfit-per-box replay (an independent detrending path — the
engine never materializes residuals)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _hourly(spark):
    rows = (
        table(spark, SF, "events")
        .selectExpr("unix_micros(ts) div 3600000000 AS h", "value")
        .collect()
    )
    acc = defaultdict(list)
    for r in rows:
        acc[r.h].append(r.value)
    items = sorted(acc.items())
    return (
        [sum(v) / len(v) for _, v in items],
        [len(v) for _, v in items],
    )


def test_cusum_squares_replay(spark):
    row = QUERIES["events_cusum_squares"](spark, SF).collect()[0]
    x, _ = _hourly(spark)
    t = len(x)
    xbar = sum(x) / t
    e2 = [(v - xbar) ** 2 for v in x]
    ctot = sum(e2)
    best_k, best_d = None, None
    ck = 0.0
    for k, v in enumerate(e2, start=1):
        ck += v
        d = ck / ctot - k / t
        if best_d is None or abs(d) > abs(best_d) + 1e-15:
            best_k, best_d = k, d
    it = math.sqrt(t / 2) * abs(best_d)
    assert row.t_obs == t
    assert row.k_star == best_k
    assert abs(row.d_max - round(best_d, 6)) < 1e-5
    assert abs(row.it_stat - round(it, 6)) < 1e-5
    assert bool(row.variance_break) == (it > 1.358)
    # bridge endpoints: D_T == 0 exactly, so |D_max| < 1
    assert abs(row.d_max) < 1


def test_dcca_replay(spark):
    row = QUERIES["events_dcca"](spark, SF).collect()[0]
    x, c = _hourly(spark)
    s = 24
    px = np.cumsum(np.array(x) - np.mean(x))
    py = np.cumsum(np.array(c) - np.mean(c))
    nb = len(px) // s
    f2x = f2y = f2xy = 0.0
    t = np.arange(s, dtype=float)
    for b in range(nb):
        seg_x, seg_y = px[b * s : (b + 1) * s], py[b * s : (b + 1) * s]
        rx = seg_x - np.polyval(np.polyfit(t, seg_x, 1), t)
        ry = seg_y - np.polyval(np.polyfit(t, seg_y, 1), t)
        f2x += float(rx @ rx) / s
        f2y += float(ry @ ry) / s
        f2xy += float(rx @ ry) / s
    f2x, f2y, f2xy = f2x / nb, f2y / nb, f2xy / nb
    assert row.n_boxes == nb and row.box_size == s
    assert abs(row.f2x - round(f2x, 6)) < max(1e-4, 1e-6 * abs(f2x))
    assert abs(row.f2y - round(f2y, 6)) < max(1e-4, 1e-6 * abs(f2y))
    assert abs(row.f2xy - round(f2xy, 6)) < max(1e-4, 1e-6 * abs(f2xy))
    rho = f2xy / math.sqrt(f2x * f2y)
    assert abs(row.rho_dcca - round(rho, 6)) < 1e-4
    assert -1 - 1e-9 <= row.rho_dcca <= 1 + 1e-9
