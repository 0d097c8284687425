"""Wave-315: quantile-blend locations vs a sorted replay (plus the
robust-family ordering sanity); bin-width rules vs direct formulas."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _cents(spark):
    return sorted(
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    )


def _q(vs, frac):
    return vs[max(math.ceil(frac * len(vs)), 1) - 1]


def test_gastwirth_trimean_match_sorted_replay(spark):
    row = QUERIES["agg_gastwirth_trimean"](spark, SF).first()
    vs = _cents(spark)
    q13, q50, q23 = _q(vs, 1 / 3), _q(vs, 0.5), _q(vs, 2 / 3)
    q25, q75 = _q(vs, 0.25), _q(vs, 0.75)
    assert row["n_obs"] == len(vs)
    assert abs(row["median_value"] - q50 / 100) < 0.011
    assert abs(row["gastwirth"] - (0.3 * q13 + 0.4 * q50 + 0.3 * q23) / 100) < 1e-3
    assert abs(row["trimean"] - (q25 + 2 * q50 + q75) / 4 / 100) < 1e-3
    assert abs(row["midhinge"] - (q25 + q75) / 2 / 100) < 1e-3
    assert abs(row["qcd"] - (q75 - q25) / (q75 + q25)) < 1e-6
    # all the blends live inside the quartile box
    for col in ("gastwirth", "trimean", "midhinge"):
        assert q25 / 100 - 0.01 <= row[col] <= q75 / 100 + 0.01
    assert 0 <= row["qcd"] < 1


def test_binwidth_rules_match_formulas(spark):
    row = QUERIES["agg_binwidth_rules"](spark, SF).first()
    vs = _cents(spark)
    n = len(vs)
    mu = sum(vs) / n
    sd = math.sqrt(sum(v * v for v in vs) / n - mu * mu)
    iqr = _q(vs, 0.75) - _q(vs, 0.25)
    assert row["n_obs"] == n
    assert row["sturges_bins"] == math.ceil(math.log2(n)) + 1
    scott = 3.49 * sd * n ** (-1 / 3)
    fd = 2 * iqr * n ** (-1 / 3)
    assert abs(row["scott_width"] - scott / 100) < 1e-3
    assert abs(row["fd_width"] - fd / 100) < 1e-3
    rng = max(vs) - min(vs)
    assert row["scott_bins"] == math.ceil(rng / scott)
    assert row["fd_bins"] == math.ceil(rng / fd)
    # FD resists outliers, so on long-tailed data its width is at most
    # Scott's normal-reference width up to the robust/moment gap; both
    # planners must propose at least Sturges' coarse count
    assert row["scott_bins"] >= row["sturges_bins"]
    assert row["fd_bins"] >= row["sturges_bins"]
