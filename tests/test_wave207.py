"""Wave-207: risk metrics vs numpy on the replayed nano-int returns;
PACF vs statsmodels-free Durbin-Levinson recursion in python."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _rets(spark):
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    days = sorted(y)
    rets = []
    for d in days:
        if d - 1 in y:
            rets.append((d, int(math.floor(1e9 * (y[d] - y[d - 1]) / y[d - 1]))))
    return rets


def test_risk_metrics_numpy(spark):
    row = QUERIES["events_risk_metrics"](spark, SF).collect()[0]
    rets = _rets(spark)
    rn = np.array([r for _, r in rets], dtype=np.int64)
    n = len(rn)
    mean = rn.mean() / 1e9
    std = math.sqrt((n * (rn.astype(object) ** 2).sum() - int(rn.sum()) ** 2)) / (
        1e9 * n
    )
    sharpe = mean / std
    down2 = sum(int(r) ** 2 for r in rn if r < 0)
    sortino = mean / math.sqrt(down2 / (1e18 * n))
    k = math.ceil(0.05 * n)
    srt = sorted(rets, key=lambda t: (t[1], t[0]))
    var_n = srt[k - 1][1]
    tail = [r for _, r in rets if r <= var_n]
    assert row["n_days"] == n
    assert abs(row["mean_ret"] - mean) < 1e-6
    assert abs(row["std_ret"] - std) < 1e-6
    assert abs(row["sharpe"] - sharpe) < 1e-4
    assert abs(row["sortino"] - sortino) < 1e-4
    assert abs(row["var_95"] - var_n / 1e9) < 1e-6
    assert abs(row["cvar_95"] - sum(tail) / (1e9 * len(tail))) < 1e-6
    # CVaR is at least as bad as VaR by construction
    assert row["cvar_95"] <= row["var_95"]


def test_pacf_durbin_levinson(spark):
    rows = {r["lag"]: r for r in QUERIES["events_pacf"](spark, SF).collect()}
    rn = np.array([r for _, r in _rets(spark)], dtype=np.float64)
    n = len(rn)
    mu = rn.mean()
    c = rn - mu
    gam = [float((c[: n - k] * c[k:]).sum()) for k in range(4)]
    rho = [g / gam[0] for g in gam]
    r1, r2, r3 = rho[1], rho[2], rho[3]
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - r1 * phi22
    phi33 = (r3 - r1 * phi22 - r2 * phi21) / (1 - r1 * phi21 - r2 * phi22)
    assert abs(rows[1]["acf"] - r1) < 1e-4
    assert abs(rows[1]["pacf"] - r1) < 1e-4
    assert abs(rows[2]["acf"] - r2) < 1e-4
    assert abs(rows[2]["pacf"] - phi22) < 1e-4
    assert abs(rows[3]["acf"] - r3) < 1e-4
    assert abs(rows[3]["pacf"] - phi33) < 1e-4
    for r in rows.values():
        assert -1.01 <= r["acf"] <= 1.01
