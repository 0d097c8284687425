"""Wave-348: DF/KPSS/Cochrane-Orcutt vs pure-python OLS replays."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    return [agg[d][1] / 100.0 / agg[d][0] for d in sorted(agg)]


def test_dickey_fuller_replay(spark):
    y = _daily(spark)
    dy = [y[i] - y[i - 1] for i in range(1, len(y))]
    yl = y[:-1]
    n = len(dy)
    mdy, myl = sum(dy) / n, sum(yl) / n
    cov = sum(a * b for a, b in zip(dy, yl)) - n * mdy * myl
    varx = sum(x * x for x in yl) - n * myl * myl
    rho = cov / varx
    ssr = (sum(d * d for d in dy) - n * mdy * mdy) - cov * cov / varx
    tau = rho / math.sqrt(ssr / (n - 2) / varx)
    row = QUERIES["events_dickey_fuller"](spark, SF).first()
    assert row["n_diffs"] == n
    assert abs(row["rho_hat"] - rho) < 1e-6
    assert abs(row["drift"] - (mdy - rho * myl)) < 1e-5
    assert abs(row["df_tau"] - tau) < 1e-5
    assert row["rejects_unit_root"] == (tau < -2.986)
    # a mean-reverting noise series should reject decisively
    assert row["df_tau"] < 0


def test_kpss_replay(spark):
    y = _daily(spark)
    n = len(y)
    mu = sum(y) / n
    e = [v - mu for v in y]
    s = []
    run = 0.0
    for v in e:
        run += v
        s.append(run)
    g0 = sum(v * v for v in e)
    g1 = sum(e[i] * e[i - 1] for i in range(1, n))
    g2 = sum(e[i] * e[i - 2] for i in range(2, n))
    lrv = (g0 + 2 * (2 / 3) * g1 + 2 * (1 / 3) * g2) / n
    eta = sum(v * v for v in s) / (n * n) / lrv
    row = QUERIES["events_kpss_test"](spark, SF).first()
    assert row["n_days"] == n
    assert abs(row["gamma0"] - g0 / n) < 1e-6
    assert abs(row["long_run_var"] - lrv) < 1e-6
    assert abs(row["kpss_eta"] - eta) < 1e-6
    assert row["rejects_stationarity"] == (eta > 0.463)


def test_cochrane_orcutt_replay(spark):
    y = _daily(spark)
    n = len(y)
    ts = list(range(1, n + 1))
    mt, my = sum(ts) / n, sum(y) / n
    b0 = (sum(t * v for t, v in zip(ts, y)) - n * mt * my) / (
        sum(t * t for t in ts) - n * mt * mt
    )
    a0 = my - b0 * mt
    e = [v - (a0 + b0 * t) for t, v in zip(ts, y)]
    r = sum(e[i] * e[i - 1] for i in range(1, n)) / sum(
        e[i - 1] ** 2 for i in range(1, n)
    )
    ys = [y[i] - r * y[i - 1] for i in range(1, n)]
    xs = [ts[i] - r * (ts[i] - 1) for i in range(1, n)]
    n2 = len(ys)
    mys, mxs = sum(ys) / n2, sum(xs) / n2
    b2 = (sum(a * b for a, b in zip(ys, xs)) - n2 * mys * mxs) / (
        sum(x * x for x in xs) - n2 * mxs * mxs
    )
    a2 = (mys - b2 * mxs) / (1 - r)
    row = QUERIES["model_cochrane_orcutt"](spark, SF).first()
    assert row["n_days"] == n
    assert abs(row["slope_ols"] - b0) < 1e-6
    assert abs(row["rho_hat"] - r) < 1e-6
    assert abs(row["slope_co"] - b2) < 1e-6
    assert abs(row["intercept_co"] - a2) < 1e-4
    assert -1 < row["rho_hat"] < 1
