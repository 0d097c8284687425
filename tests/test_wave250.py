"""Wave-250: Poisson Newton step vs a numpy IRLS-first-iteration replay
(the full 2x2 solve, independent of the engine's symbolic reduction),
KM+Greenwood vs a per-subject lifelines-free replay with the CI
monotonicity/clipping invariants."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_poisson_newton_replay(spark):
    row = QUERIES["model_poisson_newton_step"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h",
        "CAST(event_type = 'purchase' AS INT) AS p",
        "dayofweek(ts) AS dow",
    ).collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        per[r.h][0] += r.p
        per[r.h][1] = 1 if r.dow in (1, 7) else 0
    y = np.array([v[0] for v in per.values()], dtype=float)
    x = np.array([v[1] for v in per.values()], dtype=float)
    n = len(y)
    ybar = y.mean()
    # full IRLS first step from (ln ybar, 0): beta_new = beta + I^-1 U
    X = np.column_stack([np.ones(n), x])
    mu = np.full(n, ybar)
    U = X.T @ (y - mu)
    I = X.T @ (X * mu[:, None])
    delta = np.linalg.solve(I, U)
    b0, b1 = math.log(ybar) + delta[0], delta[1]
    i_prof = I[1, 1] - I[0, 1] ** 2 / I[0, 0]
    z = U[1] / math.sqrt(i_prof)
    assert row.n_hours == n
    assert abs(row.mean_rate - round(ybar, 6)) < 1e-6
    assert abs(row.beta0_onestep - round(b0, 6)) < 1e-4
    assert abs(row.beta1_onestep - round(b1, 6)) < 1e-4
    assert abs(row.score_z - round(float(z), 6)) < 1e-4
    assert abs(row.rate_ratio_weekend - round(math.exp(b1), 6)) < 1e-4


def test_km_greenwood_replay(spark):
    rows = {r.day: r for r in QUERIES["model_km_greenwood"](spark, SF).collect()}
    assert set(rows) == set(range(1, 9))
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_type"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.us, r.event_type))
    subj = []
    for evs in per.values():
        evs.sort()
        t0, tlast = evs[0][0], evs[-1][0]
        tp = min((us for us, et in evs if et == "purchase"), default=None)
        if tp is None:
            subj.append(((tlast - t0) // 86400000000 + 1, 0))
        else:
            subj.append(((tp - t0) // 86400000000 + 1, 1))
    s, gw = 1.0, 0.0
    prev_s = 1.0
    for k in range(1, 9):
        r_k = sum(1 for t, _ in subj if t >= k)
        d_k = sum(1 for t, d in subj if t == k and d == 1)
        if r_k > 0:
            s *= 1 - d_k / r_k
        if r_k > 0 and r_k != d_k:
            gw += d_k / (r_k * (r_k - d_k))
        se = s * math.sqrt(gw)
        row = rows[k]
        assert row.at_risk == r_k and row.converted == d_k, k
        assert abs(row.km_survival - round(s, 6)) < 1e-9, k
        assert abs(row.greenwood_se - round(se, 6)) < 1e-9, k
        assert abs(row.ci_lo - round(max(0.0, s - 1.959964 * se), 6)) < 1e-9
        assert abs(row.ci_hi - round(min(1.0, s + 1.959964 * se), 6)) < 1e-9
        # survival is non-increasing; bands bracket the estimate
        assert s <= prev_s + 1e-12
        assert row.ci_lo <= row.km_survival <= row.ci_hi
        prev_s = s
