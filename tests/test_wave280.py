"""Wave-280: Duane vs a numpy polyfit replay, MCF vs a per-user sweep
replay (plus MCF monotonicity and the no-censoring equivalence: when
everyone is at risk, MCF increments equal mean events per user)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_duane_growth_replay(spark):
    row = QUERIES["model_duane_growth"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) AS t", "event_id", "event_type"
    ).collect()
    start = min(r.t for r in ev)
    fails = sorted(
        (r.t, r.event_id) for r in ev if r.event_type == "error"
    )
    lx, ly = [], []
    for n, (t, _eid) in enumerate(fails, start=1):
        if t <= start:
            continue
        hrs = (t - start) / 3600000000.0
        lx.append(math.log(hrs))
        ly.append(math.log(n / hrs))
    slope, intercept = np.polyfit(np.array(lx), np.array(ly), 1)
    assert row.n_failures == len(lx)
    assert abs(row.duane_slope - round(float(slope), 6)) < 1e-4
    assert abs(row.ln_lambda - round(float(intercept), 6)) < 1e-3
    assert abs(row.growth_alpha + row.duane_slope) < 1e-9
    assert bool(row.reliability_growing) == (slope < 0)


def test_mcf_recurrent_replay(spark):
    rows = {r.age_days: r for r in QUERIES["events_mcf_recurrent"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "CAST(ts AS DATE) AS d", "event_type"
    ).collect()
    d0, dlast = {}, {}
    for r in ev:
        if r.user_id not in d0 or r.d < d0[r.user_id]:
            d0[r.user_id] = r.d
        if r.user_id not in dlast or r.d > dlast[r.user_id]:
            dlast[r.user_id] = r.d
    errs = defaultdict(int)
    for r in ev:
        if r.event_type == "error":
            errs[(r.d - d0[r.user_id]).days] += 1
    spans = {u: (dlast[u] - d0[u]).days for u in d0}
    mcf = 0.0
    prev = -1.0
    for t in range(0, 28):
        n_risk = sum(1 for s in spans.values() if s >= t)
        if n_risk == 0:
            assert t not in rows
            continue
        mcf += errs.get(t, 0) / n_risk
        r = rows[t]
        assert r.n_events == errs.get(t, 0), t
        assert r.n_risk == n_risk, t
        assert abs(r.mcf - round(mcf, 6)) < 1e-5
        # MCF is non-decreasing by construction
        assert r.mcf >= prev - 1e-9
        prev = r.mcf
