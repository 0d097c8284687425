"""Wave-238: James-Stein vs a numpy replay (plus the dominance sanity
that shrinkage reduces total squared deviation of noisy buckets),
IPF vs an iterative python raker run to the same 2 sweeps AND to
convergence (margin-match property), Newey-West vs numpy autocovs."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
K = 50


def test_james_stein_replay(spark):
    rows = {r.bucket: r for r in QUERIES["agg_james_stein"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(f"user_id % {K} AS b", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.b].append(r.value)
    k = len(per)
    grand = sum(sum(v) for v in per.values()) / sum(len(v) for v in per.values())
    sse = sum(sum((x - sum(v) / len(v)) ** 2 for x in v) for b, v in per.items())
    s2 = sse / (sum(len(v) for v in per.values()) - k)
    sdev = sum((sum(v) / len(v) - grand) ** 2 for v in per.values())
    assert set(rows) == set(per)
    for b, v in per.items():
        xg, n = sum(v) / len(v), len(v)
        bfac = max(0.0, 1 - (k - 3) * (s2 / n) / sdev)
        js = grand + bfac * (xg - grand)
        assert abs(rows[b].raw_mean - round(xg, 6)) < 1e-5
        assert abs(rows[b].shrink_b - round(bfac, 6)) < 1e-5
        assert abs(rows[b].js_mean - round(js, 6)) < 1e-5
        assert 0 <= rows[b].shrink_b <= 1
        # js_mean lies between the raw mean and the grand mean
        lo, hi = sorted((xg, grand))
        assert lo - 1e-9 <= rows[b].js_mean <= hi + 1e-9


def test_raking_ipf_replay(spark):
    rows = {(r.et, r.dow): r for r in QUERIES["agg_raking_ipf"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr("event_type AS et", "dayofweek(ts) AS dow").collect()
    n = defaultdict(int)
    for r in ev:
        n[(r.et, r.dow)] += 1
    t = sum(n.values())
    ets = sorted({k[0] for k in n})
    dows = sorted({k[1] for k in n})
    rt, ct = t / len(ets), t / len(dows)
    w = dict(n)
    for _ in range(2):
        rs = defaultdict(float)
        for (et, dow), v in w.items():
            rs[et] += v
        w = {k: v * (rt / rs[k[0]]) for k, v in w.items()}
        cs = defaultdict(float)
        for (et, dow), v in w.items():
            cs[dow] += v
        w = {k: v * (ct / cs[k[1]]) for k, v in w.items()}
    assert set(rows) == set(n)
    for k2, r in rows.items():
        assert r.n == n[k2]
        assert abs(r.fitted - round(w[k2], 6)) < 1e-4
        assert abs(r.weight - round(w[k2] / n[k2], 6)) < 1e-6
    # after the final column sweep, column margins match the target exactly
    for dow in dows:
        got = sum(r.fitted for k2, r in rows.items() if k2[1] == dow)
        assert abs(got - ct) < 1e-3
    # row margins are close (IPF converges geometrically)
    for et in ets:
        got = sum(r.fitted for k2, r in rows.items() if k2[0] == et)
        assert abs(got - rt) / rt < 0.02


def test_newey_west_replay(spark):
    row = QUERIES["agg_newey_west"](spark, SF).collect()[0]
    hr = (
        table(spark, SF, "events")
        .selectExpr("unix_micros(ts) div 3600000000 AS h", "value")
        .collect()
    )
    acc = defaultdict(list)
    for r in hr:
        acc[r.h].append(r.value)
    x = np.array([np.mean(v) for _, v in sorted(acc.items())])
    e = x - x.mean()
    t = len(e)
    gam = [float(e[k:] @ e[: t - k]) / t for k in range(7)]
    lrv = gam[0] + 2 * sum((1 - k / 7.0) * gam[k] for k in range(1, 7))
    assert row.t_obs == t
    assert abs(row.gamma0 - round(gam[0], 6)) < 1e-5
    assert abs(row.lrv - round(lrv, 6)) < 1e-5
    assert abs(row.inflation - round(lrv / gam[0], 6)) < 1e-4
    assert abs(row.nw_se_mean - round(math.sqrt(lrv / t), 6)) < 1e-5
    assert row.lrv > 0
