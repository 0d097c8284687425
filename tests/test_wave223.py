"""Wave-223: Anderson-Darling vs a python replay with the same A&S CDF
(plus a scipy-free accuracy check of the approximation); Fisher CI vs
math.atanh/tanh closed form."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_P = 0.2316419


def _phi(z: float) -> float:
    t = 1.0 / (1.0 + _P * abs(z))
    poly = t * (_B[0] + t * (_B[1] + t * (_B[2] + t * (_B[3] + t * _B[4]))))
    upper = 1.0 - math.exp(-0.5 * z * z) / math.sqrt(2 * math.pi) * poly
    return upper if z >= 0 else 1.0 - upper


def _daily(spark, with_x=False):
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y, x = Counter(), Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
        x[d] += 1
    return (y, x) if with_x else y


def test_anderson_darling_replay(spark):
    row = QUERIES["agg_anderson_darling"](spark, SF).collect()[0]
    y = _daily(spark)
    vals = sorted((v, d) for d, v in y.items())
    n = len(vals)
    s = sum(v for v, _ in vals)
    s2 = sum(v * v for v, _ in vals)
    mean = s / n
    sd = math.sqrt((n * s2 - s * s) / (n * (n - 1)))
    z = [(v - mean) / sd for v, _ in vals]
    ssum = sum(
        (2 * (i + 1) - 1) * (math.log(_phi(z[i])) + math.log(1 - _phi(z[n - 1 - i])))
        for i in range(n)
    )
    a2 = -n - ssum / n
    corr = 1 + 0.75 / n + 2.25 / (n * n)
    assert row["n_days"] == n
    assert abs(row["a2"] - a2) < 1e-4
    assert abs(row["a2_star"] - a2 * corr) < 1e-4
    assert row["reject_5pct"] == (a2 * corr > 0.752)
    # the A&S approximation itself is accurate to ~7.5e-8 vs erf
    for zz in (-2.5, -1.0, 0.0, 0.3, 1.7, 3.0):
        exact = 0.5 * (1 + math.erf(zz / math.sqrt(2)))
        assert abs(_phi(zz) - exact) < 1e-7


def test_corr_fisher_ci_closed_form(spark):
    row = QUERIES["agg_corr_fisher_ci"](spark, SF).collect()[0]
    y, x = _daily(spark, with_x=True)
    days = sorted(y)
    n = len(days)
    xs = [x[d] for d in days]
    ys = [y[d] for d in days]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    fz = math.atanh(r)
    hw = 1.959963984540054 / math.sqrt(n - 3)
    assert row["n_days"] == n
    assert abs(row["pearson_r"] - r) < 1e-6
    assert abs(row["fisher_z"] - fz) < 1e-5
    assert abs(row["ci_lo"] - math.tanh(fz - hw)) < 1e-5
    assert abs(row["ci_hi"] - math.tanh(fz + hw)) < 1e-5
    assert row["ci_lo"] <= row["pearson_r"] <= row["ci_hi"]
