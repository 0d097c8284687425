"""Wave-263: Sobel mediation vs numpy lstsq fits with statsmodels-free
SEs, time-decay attribution vs a per-conversion replay plus the credit
conservation law."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_mediation_sobel_replay(spark):
    row = QUERIES["model_mediation_sobel"](spark, SF).collect()[0]
    li = table(spark, SF, "lineitem").selectExpr(
        "l_discount AS x",
        "CAST(l_quantity AS DOUBLE) AS m",
        "l_extendedprice / 1000.0 AS y",
    ).collect()
    x = np.array([r.x for r in li])
    m = np.array([r.m for r in li])
    y = np.array([r.y for r in li])
    n = len(x)
    # path a: M ~ X
    Xa = np.column_stack([np.ones(n), x])
    coef_a = np.linalg.lstsq(Xa, m, rcond=None)[0]
    a = coef_a[1]
    resid_a = m - Xa @ coef_a
    var_a = (resid_a @ resid_a) / (n - 2) / ((x - x.mean()) @ (x - x.mean()))
    # paths b, c': Y ~ X + M
    Xb = np.column_stack([np.ones(n), x, m])
    coef_b = np.linalg.lstsq(Xb, y, rcond=None)[0]
    cprime, b = coef_b[1], coef_b[2]
    resid_b = y - Xb @ coef_b
    sigma2 = (resid_b @ resid_b) / (n - 3)
    cxx = (x - x.mean()) @ (x - x.mean())
    cmm = (m - m.mean()) @ (m - m.mean())
    cxm = (x - x.mean()) @ (m - m.mean())
    var_b = sigma2 * cxx / (cxx * cmm - cxm * cxm)
    z = a * b / math.sqrt(b * b * var_a + a * a * var_b)
    assert row.n == n
    assert abs(row.path_a - round(float(a), 6)) < 1e-4
    assert abs(row.path_b - round(float(b), 6)) < 1e-4
    assert abs(row.direct_cprime - round(float(cprime), 6)) < 1e-3
    assert abs(row.indirect_ab - round(float(a * b), 6)) < 1e-4
    assert abs(row.sobel_z - round(float(z), 6)) < 1e-2
    assert bool(row.mediation_present) == (abs(z) > 1.959964)


def test_time_decay_attribution_replay(spark):
    rows = {r.event_type: r for r in QUERIES["events_attribution_time_decay"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "event_id", "event_type", "unix_micros(ts) AS t"
    ).collect()
    HL, WIN = 3 * 86400000000.0, 7 * 86400000000
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    credit = defaultdict(float)
    touches = defaultdict(int)
    convs = defaultdict(set)
    total_conversions_attributed = 0
    for _u, evs in by_user.items():
        purchases = [r for r in evs if r.event_type == "purchase"]
        tl = [r for r in evs if r.event_type in ("click", "view")]
        for p in purchases:
            ws = [
                (t.event_type, math.exp(-(p.t - t.t) * math.log(2) / HL))
                for t in tl
                if t.t < p.t and t.t >= p.t - WIN
            ]
            if not ws:
                continue
            total_conversions_attributed += 1
            z = sum(w for _, w in ws)
            for et, w in ws:
                credit[et] += w / z
                touches[et] += 1
                convs[et].add(p.event_id)
    assert set(rows) == set(credit)
    for et, r in rows.items():
        assert r.n_touches == touches[et]
        assert r.n_conversions == len(convs[et])
        assert abs(r.credit - round(credit[et], 6)) < 1e-4
    # conservation: every attributed conversion hands out exactly 1 credit
    assert abs(sum(r.credit for r in rows.values()) - total_conversions_attributed) < 1e-3
