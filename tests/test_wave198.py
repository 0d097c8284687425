"""Wave-198: Atkinson vs closed-form python, Box-Cox vs an unquantized
numpy grid (same argmax), churn labels vs a dict replay."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_atkinson_closed_form(spark):
    row = QUERIES["agg_atkinson_index"](spark, SF).collect()[0]
    ps = [
        r["o_totalprice"]
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
        if r["o_totalprice"] > 0
    ]
    n = len(ps)
    cents = sum(int(math.floor(p * 100 + 0.5)) for p in ps)
    sqrt_micro = sum(int(math.floor(math.sqrt(p) * 1e6)) for p in ps)
    inv_pico = sum(int(math.floor(1e12 / p)) for p in ps)
    mean = cents / (100.0 * n)
    a_half = 1 - (sqrt_micro / (1e6 * n)) ** 2 / mean
    a_two = 1 - (n * 1e12 / inv_pico) / mean
    assert row["n"] == n
    assert abs(row["mean_price"] - mean) < 1e-4
    assert abs(row["atkinson_eps_half"] - a_half) < 1e-5
    assert abs(row["atkinson_eps_two"] - a_two) < 1e-5
    # inequality ordering: more inequality-averse epsilon -> larger index
    assert 0 <= row["atkinson_eps_half"] <= row["atkinson_eps_two"] <= 1


def test_boxcox_grid_argmax_matches_numpy(spark):
    rows = sorted(
        QUERIES["model_boxcox_grid"](spark, SF).collect(),
        key=lambda r: r["lambda"],
    )
    x = np.array(
        [
            r["o_totalprice"]
            for r in table(spark, SF, "orders").select("o_totalprice").collect()
            if r["o_totalprice"] > 0
        ]
    )
    n = len(x)
    slnx = np.log(x).sum()
    best_lam, best_ll = None, -np.inf
    for lam in [-1.0, -0.5, 0.0, 0.5, 1.0]:
        y = np.log(x) if lam == 0 else (x**lam - 1) / lam
        ll = -0.5 * n * np.log(y.var()) + (lam - 1) * slnx
        if ll > best_ll:
            best_lam, best_ll = lam, ll
    got = {r["lambda"]: r for r in rows}
    assert len(got) == 5
    # quantization shifts loglik microscopically; the winner must agree
    winners = [r["lambda"] for r in rows if r["is_best"]]
    assert winners == [best_lam]
    for lam, r in got.items():
        y = np.log(x) if lam == 0 else (x**lam - 1) / lam
        ll = -0.5 * n * np.log(y.var()) + (lam - 1) * slnx
        assert abs(r["loglik"] - ll) < max(1.0, abs(ll) * 1e-3)


def test_churn_labels_replay(spark):
    rows = {r["user_id"]: r for r in QUERIES["events_churn_labels"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("user_id", "ts").collect()
    from datetime import date

    obs = defaultdict(set)
    cnt = defaultdict(int)
    fut = set()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        if d < 20:
            obs[r["user_id"]].add(d)
            cnt[r["user_id"]] += 1
        else:
            fut.add(r["user_id"])
    assert set(rows) == set(obs)
    for u, days in obs.items():
        r = rows[u]
        assert r["n_events_obs"] == cnt[u]
        assert r["active_days"] == len(days)
        assert r["last_day"] == max(days)
        assert r["recency_days"] == 19 - max(days)
        assert r["churned"] == (u not in fut)
