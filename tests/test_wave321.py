"""Wave-321: Gini correlations vs a midrank replay (plus the
Pearson/Spearman sandwich sanity); robust skewness family vs direct
order statistics."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _midranks(vals):
    cnt = Counter(vals)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    return {v: below[v] + (cnt[v] + 1) / 2 for v in cnt}


def test_gini_correlation_matches_midrank_replay(spark):
    row = QUERIES["agg_gini_correlation"](spark, SF).first()
    pts = [
        (int(r["l_quantity"]), int(round(r["l_extendedprice"] * 100)))
        for r in table(spark, SF, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .collect()
    ]
    rx = _midranks([x for x, _ in pts])
    ry = _midranks([y for _, y in pts])
    n = len(pts)

    def cov(a, b):
        ma, mb = sum(a) / n, sum(b) / n
        return sum(x * y for x, y in zip(a, b)) / n - ma * mb

    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    rkx = [rx[x] for x in xs]
    rky = [ry[y] for y in ys]
    gxy = cov(xs, rky) / cov(xs, rkx)
    gyx = cov(ys, rkx) / cov(ys, rky)
    assert row["n_obs"] == n
    assert abs(row["gini_corr_xy"] - gxy) < 1e-4
    assert abs(row["gini_corr_yx"] - gyx) < 1e-4
    assert abs(row["asymmetry"] - (gxy - gyx)) < 1e-4
    # both directions are correlations: bounded by 1 in magnitude
    assert abs(row["gini_corr_xy"]) <= 1 + 1e-9
    assert abs(row["gini_corr_yx"]) <= 1 + 1e-9


def test_robust_skewness_family_matches_order_stats(spark):
    row = QUERIES["agg_skewness_robust_family"](spark, SF).first()
    vs = sorted(
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = len(vs)

    def q(f):
        return vs[max(math.ceil(f * n), 1) - 1]

    p10, p50, p90 = q(0.10), q(0.50), q(0.90)
    mean = sum(vs) / n
    sd = math.sqrt(sum(v * v for v in vs) / n - mean * mean)
    sad = sum(abs(v - p50) for v in vs) / n
    assert row["n_obs"] == n
    assert abs(row["kelly_skew"] - (p90 + p10 - 2 * p50) / (p90 - p10)) < 1e-5
    assert abs(row["groeneveld_meeden"] - (mean - p50) / sad) < 1e-5
    assert abs(row["pearson2_skew"] - 3 * (mean - p50) / sd) < 1e-4
    # GM is bounded in [-1, 1]; Kelly in [-1, 1]
    assert -1 <= row["groeneveld_meeden"] <= 1
    assert -1 <= row["kelly_skew"] <= 1
