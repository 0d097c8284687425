"""Wave-236: permutation entropy vs an argsort-based replay, Lomb-Scargle
vs the textbook two-pass tau formulation in numpy (independent algebra —
the engine uses the one-pass angle-addition form)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


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


def test_permutation_entropy_replay(spark):
    rows = {r.pattern: r for r in QUERIES["events_permutation_entropy"](spark, SF).collect()}
    x = _hourly(spark)
    pats = Counter()
    for i in range(len(x) - 2):
        win = x[i : i + 3]
        # rank via stable argsort — independent of the engine's CASE chain
        order = sorted(range(3), key=lambda j: (win[j], j))
        rank = [0, 0, 0]
        for r, j in enumerate(order):
            rank[j] = r
        pats["".join(map(str, rank))] += 1
    t = sum(pats.values())
    pe = -sum((n / t) * math.log(n / t) for n in pats.values()) / math.log(6)
    assert set(rows) == set(pats)
    for k, r in rows.items():
        assert r.n == pats[k]
        assert abs(r.p - round(pats[k] / t, 6)) < 1e-9
        assert abs(r.pe_norm - round(pe, 6)) < 1e-5
        assert set(k) <= {"0", "1", "2"} and len(set(k)) == 3  # true permutation
    assert 0 <= list(rows.values())[0].pe_norm <= 1


def test_lomb_scargle_replay(spark):
    rows = {r.period_h: r for r in QUERIES["events_lomb_scargle"](spark, SF).collect()}
    ev = (
        table(spark, SF, "events")
        .selectExpr(
            "CAST(unix_micros(ts) - 1704067200000000 AS DOUBLE)"
            " / 3600000000.0 AS t",
            "value",
        )
        .collect()
    )
    t = np.array([r.t for r in ev])
    y = np.array([r.value for r in ev])
    d = y - y.mean()
    sd2 = float(d @ d)
    n = len(y)
    for period, r in rows.items():
        w = 2 * math.pi / period
        tau = math.atan2(float(np.sum(np.sin(2 * w * t))), float(np.sum(np.cos(2 * w * t)))) / (2 * w)
        ct = float(np.sum(d * np.cos(w * (t - tau))))
        st = float(np.sum(d * np.sin(w * (t - tau))))
        cct = float(np.sum(np.cos(w * (t - tau)) ** 2))
        sst = float(np.sum(np.sin(w * (t - tau)) ** 2))
        power = 0.5 * (ct * ct / cct + st * st / sst)
        assert r.n_events == n
        assert abs(r.tau_h - round(tau, 6)) < 1e-4, period
        assert abs(r.power - round(power, 6)) < max(1e-4, 1e-6 * abs(power)), period
        assert abs(r.power_norm - round(power / (sd2 / (n - 1)), 6)) < 1e-4
    # the fixture's strongest cycle should be one of the probed periods
    assert max(rows.values(), key=lambda r: r.power_norm).power_norm > 0
