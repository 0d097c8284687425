"""Wave-237: CCC / Bland-Altman / Deming vs numpy recomputes on the
header-total vs lineitem-sum pairs, plus the analytic cross-relations
between the three (CCC <= |r|; Deming slope between OLS y|x and 1/OLS
x|y)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _pairs(spark):
    o = {r.o_orderkey: r.o_totalprice for r in table(spark, SF, "orders").collect()}
    acc = defaultdict(float)
    for r in table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice").collect():
        acc[r.l_orderkey] += r.l_extendedprice
    keys = sorted(set(o) & set(acc))
    return np.array([o[k] for k in keys]), np.array([acc[k] for k in keys])


def test_lin_ccc_replay(spark):
    row = QUERIES["agg_lin_ccc"](spark, SF).collect()[0]
    x, y = _pairs(spark)
    vx, vy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    r = cxy / math.sqrt(vx * vy)
    ccc = 2 * cxy / (vx + vy + (x.mean() - y.mean()) ** 2)
    assert row.n_pairs == len(x)
    assert abs(row.pearson_r - round(r, 6)) < 1e-5
    assert abs(row.ccc - round(ccc, 6)) < 1e-5
    assert abs(row.accuracy_cb - round(ccc / r, 6)) < 1e-5
    # agreement never exceeds correlation in magnitude
    assert abs(row.ccc) <= abs(row.pearson_r) + 1e-9
    assert 0 < row.accuracy_cb <= 1 + 1e-9


def test_bland_altman_replay(spark):
    row = QUERIES["agg_bland_altman"](spark, SF).collect()[0]
    x, y = _pairs(spark)
    d = x - y
    bias, sd = d.mean(), d.std(ddof=1)
    lo, hi = bias - 1.959964 * sd, bias + 1.959964 * sd
    assert row.n_pairs == len(d)
    assert abs(row.bias - round(float(bias), 2)) < 0.02
    assert abs(row.sd_diff - round(float(sd), 2)) < 0.02
    assert abs(row.loa_lower - round(float(lo), 2)) < 0.02
    assert abs(row.loa_upper - round(float(hi), 2)) < 0.02
    assert row.n_outside == int(np.sum((d < lo) | (d > hi)))
    # normal-ish differences put roughly <=10% outside the 95% limits
    assert row.n_outside <= 0.10 * len(d)


def test_deming_replay(spark):
    row = QUERIES["agg_deming_regression"](spark, SF).collect()[0]
    x, y = _pairs(spark)
    vx, vy = x.var(), y.var()
    cxy = ((x - x.mean()) * (y - y.mean())).mean()
    slope = (vy - vx + math.sqrt((vy - vx) ** 2 + 4 * cxy * cxy)) / (2 * cxy)
    assert abs(row.slope - round(slope, 6)) < 1e-5
    assert abs(row.intercept - round(float(y.mean() - x.mean() * slope), 2)) < 0.02
    # Deming slope lies between the two OLS extremes
    ols_yx = cxy / vx
    ols_inv = vy / cxy
    assert min(ols_yx, ols_inv) - 1e-9 <= row.slope <= max(ols_yx, ols_inv) + 1e-9
    assert abs(row.slope_minus_ols - round(slope - ols_yx, 6)) < 1e-5
