"""Wave-268: price indices vs a dict replay (plus Fisher's time-reversal
property and the L >= F >= P ordering sanity when L >= P), MZ vs a
numpy OLS/F replay."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_price_index_replay(spark):
    row = QUERIES["agg_price_index_fisher"](spark, SF).collect()[0]
    li_df = table(spark, SF, "lineitem")
    o_df = table(spark, SF, "orders")
    li = (
        li_df.join(o_df, o_df.o_orderkey == li_df.l_orderkey)
        .selectExpr(
            "l_partkey AS pk",
            "CAST(o_orderdate >= DATE '1995-06-17' AS INT) AS period",
            "l_extendedprice AS ext",
            "CAST(l_quantity AS BIGINT) AS qty",
        )
        .collect()
    )
    acc = defaultdict(lambda: [0.0, 0])
    for r in li:
        k = (r.pk, r.period)
        acc[k][0] += r.ext  # sum(price*qty) == sum extendedprice
        acc[k][1] += r.qty
    parts = {pk for (pk, _p) in acc}
    matched = [
        pk for pk in parts if (pk, 0) in acc and (pk, 1) in acc
    ]
    p0 = {pk: acc[(pk, 0)][0] / acc[(pk, 0)][1] for pk in matched}
    p1 = {pk: acc[(pk, 1)][0] / acc[(pk, 1)][1] for pk in matched}
    q0 = {pk: acc[(pk, 0)][1] for pk in matched}
    q1 = {pk: acc[(pk, 1)][1] for pk in matched}
    lasp = sum(p1[k] * q0[k] for k in matched) / sum(p0[k] * q0[k] for k in matched)
    paas = sum(p1[k] * q1[k] for k in matched) / sum(p0[k] * q1[k] for k in matched)
    fisher = math.sqrt(lasp * paas)
    assert row.n_parts == len(matched)
    assert abs(row.laspeyres - round(lasp, 6)) < 1e-5
    assert abs(row.paasche - round(paas, 6)) < 1e-5
    assert abs(row.fisher - round(fisher, 6)) < 1e-5
    assert abs(row.lp_gap - round(lasp - paas, 6)) < 1e-5
    # Fisher is the geometric mean: always between L and P
    lo, hi = sorted((row.laspeyres, row.paasche))
    assert lo - 1e-9 <= row.fisher <= hi + 1e-9
    # time-reversal (replay-side): F(0->1) * F(1->0) == 1
    lasp_r = sum(p0[k] * q1[k] for k in matched) / sum(p1[k] * q1[k] for k in matched)
    paas_r = sum(p0[k] * q0[k] for k in matched) / sum(p1[k] * q0[k] for k in matched)
    assert abs(fisher * math.sqrt(lasp_r * paas_r) - 1) < 1e-12


def test_mincer_zarnowitz_replay(spark):
    row = QUERIES["model_mincer_zarnowitz"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    ys = [sum(v) / len(v) for _, v in sorted(per.items())]
    f = np.array(ys[:-1])
    y = np.array(ys[1:])
    n = len(y)
    b, a = np.polyfit(f, y, 1)
    rss_u = float(np.sum((y - (a + b * f)) ** 2))
    rss_r = float(np.sum((y - f) ** 2))
    fstat = ((rss_r - rss_u) / 2) / (rss_u / (n - 2))
    assert row.n_pairs == n
    assert abs(row.alpha - round(float(a), 6)) < 1e-3
    assert abs(row.beta - round(float(b), 6)) < 1e-5
    assert abs(row.rss_restricted - round(rss_r, 6)) < 1e-4
    assert abs(row.rss_unrestricted - round(rss_u, 6)) < 1e-4
    assert abs(row.f_stat - round(fstat, 6)) < 1e-3
    assert bool(row.forecast_irrational) == (fstat > 3.354131)
    # the restriction can only cost fit
    assert row.rss_restricted >= row.rss_unrestricted - 1e-9
