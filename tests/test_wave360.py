"""Wave-360: ZIP and beta-binomial MoM vs python replays."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
TRIALS = 20


def test_zip_fit_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id", "CAST(ts AS DATE) AS d", "event_type"
    ).collect()
    users = {r["user_id"] for r in rows}
    days = {r["d"] for r in rows}
    cnt = {}
    for r in rows:
        if r["event_type"] == "purchase":
            cnt[(r["user_id"], r["d"])] = cnt.get((r["user_id"], r["d"]), 0) + 1
    xs = [cnt.get((u, d), 0) for u in users for d in days]
    n = len(xs)
    m = sum(xs) / n
    v = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
    lam = (v + m * m - m) / m
    pi = 1 - m / lam
    n0 = sum(1 for x in xs if x == 0)
    pz = n * math.exp(-m)
    score = (n0 - pz) ** 2 / (
        n * math.exp(-m) * (1 - math.exp(-m)) - n * m * math.exp(-2 * m)
    )
    row = QUERIES["model_zip_fit"](spark, SF).first()
    assert row["n_cells"] == n and row["n_zero"] == n0
    assert abs(row["mean_count"] - m) < 1e-6
    assert abs(row["var_count"] - v) < 1e-6
    assert abs(row["zip_lambda"] - lam) < 1e-5
    assert abs(row["zip_pi"] - pi) < 1e-5
    assert abs(row["poisson_expected_zeros"] - pz) < 1e-4
    assert abs(
        row["zip_expected_zeros"] - n * (pi + (1 - pi) * math.exp(-lam))
    ) < 1e-4
    assert abs(row["score_chi2"] - score) < 1e-4
    assert row["zero_inflated"] == (score > 3.841459)
    # the ZIP fit reproduces the observed zero count better than Poisson
    assert abs(row["zip_expected_zeros"] - n0) <= abs(pz - n0) + 1e-6


def test_beta_binomial_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y",
        "unix_micros(ts) AS us",
        "event_id",
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r["user_id"], []).append(
            (r["us"] * 100000000 + r["event_id"], r["y"])
        )
    xs = []
    for seq in per.values():
        if len(seq) < TRIALS:
            continue
        seq.sort()
        xs.append(sum(y for _, y in seq[:TRIALS]))
    k = len(xs)
    p = sum(xs) / k / TRIALS
    v = (sum(x * x for x in xs) - sum(xs) ** 2 / k) / (k - 1)
    icc = (v / (TRIALS * p * (1 - p)) - 1) / (TRIALS - 1)
    row = QUERIES["model_beta_binomial_mom"](spark, SF).first()
    assert row["n_users"] == k
    assert abs(row["mean_rate"] - p) < 1e-6
    assert abs(row["var_successes"] - v) < 1e-6
    assert abs(row["intraclass_rho"] - icc) < 1e-6
    assert abs(row["alpha"] - p * (1 - icc) / icc) < 1e-4
    assert abs(row["beta"] - (1 - p) * (1 - icc) / icc) < 1e-4
    assert row["overdispersed"] == (v > TRIALS * p * (1 - p))
