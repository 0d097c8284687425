"""Wave-243: Fisher LDA vs a numpy linalg.solve replay, Cox score step vs
a per-user risk-set replay (plus the U^2/I == logrank-chi2 identity
against an independently computed observed-minus-expected logrank),
Sobol indices vs a groupdict replay with the law-of-total-variance
bound."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_fisher_lda_replay(spark):
    row = QUERIES["model_fisher_lda"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('purchase','view')")
        .selectExpr(
            "CAST(event_type = 'purchase' AS INT) AS c",
            "value AS x1",
            "CAST(unix_micros(ts) % 86400000000 AS DOUBLE)/3600000000.0 AS x2",
        )
        .collect()
    )
    X = np.array([[r.x1, r.x2] for r in ev])
    c = np.array([r.c for r in ev])
    mu0, mu1 = X[c == 0].mean(axis=0), X[c == 1].mean(axis=0)
    sw = np.zeros((2, 2))
    for cls, mu in ((0, mu0), (1, mu1)):
        d = X[c == cls] - mu
        sw += d.T @ d
    w = np.linalg.solve(sw, mu1 - mu0)
    w = w / np.linalg.norm(w)
    thr = float(w @ (mu0 + mu1) / 2)
    pred = (X @ w > thr).astype(int)
    acc = float((pred == c).mean())
    assert row.n0 == int((c == 0).sum()) and row.n1 == int((c == 1).sum())
    assert abs(row.w1 - round(float(w[0]), 6)) < 1e-4
    assert abs(row.w2 - round(float(w[1]), 6)) < 1e-4
    assert abs(row.threshold - round(thr, 6)) < 1e-3
    assert abs(row.train_accuracy - round(acc, 6)) < 1e-3
    assert abs(row.w1**2 + row.w2**2 - 1) < 1e-5  # unit vector


def test_cox_score_step_replay(spark):
    row = QUERIES["model_cox_score_step"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_type"
    ).collect()
    per = {}
    for r in ev:
        per.setdefault(r.user_id, []).append((r.us, r.event_type))
    subj = []
    for evs in per.values():
        evs.sort()
        t0 = evs[0][0]
        tlast = evs[-1][0]
        tp = min((us for us, et in evs if et == "purchase"), default=None)
        cutoff = tp if tp is not None else float("inf")
        z = 1 if any(et == "click" and us < cutoff for us, et in evs) else 0
        if tp is None:
            subj.append(((tlast - t0) // 3600000000, 0, z))
        else:
            subj.append(((tp - t0) // 3600000000, 1, z))
    death_times = sorted({t for t, died, _ in subj if died})
    u_stat = info = 0.0
    for t in death_times:
        risk = [(dd, zz) for (tt, dd, zz) in subj if tt >= t]
        n_t = len(risk)
        m_t = sum(z for _, z in risk)
        deaths = [(dd, zz) for (tt, dd, zz) in subj if tt == t and dd]
        d_t = len(deaths)
        s_t = sum(z for _, z in deaths)
        p = m_t / n_t
        u_stat += s_t - d_t * p
        info += d_t * p * (1 - p)
    assert row.n_users == len(per)
    assert row.n_deaths == sum(d for _, d, _ in subj)
    assert abs(row.u_score - round(u_stat, 6)) < 1e-4
    assert abs(row.information - round(info, 6)) < 1e-4
    assert abs(row.beta_one_step - round(u_stat / info, 6)) < 1e-4
    # the score test IS the (Breslow-tie) logrank chi-square
    assert abs(row.score_chi2 - round(u_stat * u_stat / info, 6)) < 1e-4
    assert row.n_deaths > 0 and row.information > 0  # non-degenerate fixture
    assert row.n_treated == sum(z for _, _, z in subj)


def test_sobol_binned_replay(spark):
    row = QUERIES["model_sobol_binned"](spark, SF).collect()[0]
    li = table(spark, SF, "lineitem").selectExpr(
        "l_extendedprice AS y",
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(ROUND(l_discount*100) AS BIGINT) AS d",
    ).collect()
    y = np.array([r.y for r in li])
    mu, vy = y.mean(), y.var()

    def cond_var(keyf):
        groups = defaultdict(list)
        for r in li:
            groups[keyf(r)].append(r.y)
        return sum(len(v) * (np.mean(v) - mu) ** 2 for v in groups.values()) / len(y)

    vq = cond_var(lambda r: r.q)
    vd = cond_var(lambda r: r.d)
    vqd = cond_var(lambda r: (r.q, r.d))
    assert row.n == len(y)
    assert abs(row.var_y - round(float(vy), 2)) < 0.5
    assert abs(row.s_qty - round(float(vq / vy), 6)) < 1e-4
    assert abs(row.s_disc - round(float(vd / vy), 6)) < 1e-4
    assert abs(row.s_joint - round(float(vqd / vy), 6)) < 1e-4
    assert abs(row.s_interaction - round(float((vqd - vq - vd) / vy), 6)) < 1e-4
    # law of total variance: every index in [0, 1]; joint >= each marginal
    assert 0 <= row.s_qty <= 1 and 0 <= row.s_disc <= 1 and 0 <= row.s_joint <= 1
    assert row.s_joint >= row.s_qty - 1e-9 and row.s_joint >= row.s_disc - 1e-9
