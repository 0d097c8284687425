"""Wave-319: NB overdispersion vs a filled-grid replay (zeros included);
Lexis ratio vs the chi-square identity."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_negbin_matches_filled_grid_replay(spark):
    row = QUERIES["agg_negbin_overdispersion"](spark, SF).first()
    hrs = Counter(
        r["h"]
        for r in table(spark, SF, "events")
        .selectExpr("unix_micros(date_trunc('hour', ts)) div 3600000000 AS h")
        .collect()
    )
    h0, h1 = min(hrs), max(hrs)
    xs = [hrs.get(h, 0) for h in range(h0, h1 + 1)]
    n = len(xs)
    m = sum(xs) / n
    v = sum(x * x for x in xs) / n - m * m
    k = m * m / (v - m)
    zeros = sum(1 for x in xs if x == 0)
    assert row["n_hours"] == n
    assert row["zero_hours"] == zeros
    assert abs(row["mean_per_hour"] - m) < 1e-4
    assert abs(row["dispersion_index"] - v / m) < 1e-4
    assert abs(row["negbin_k"] - k) < 1e-3
    assert abs(row["poisson_expected_zeros"] - n * math.exp(-m)) < 1e-3
    assert abs(
        row["negbin_expected_zeros"] - n * (k / (k + m)) ** k
    ) < max(1e-3, row["negbin_expected_zeros"] * 1e-4)
    assert row["overdispersed"] == (v / m > 1)
    # NB nests Poisson: its zero expectation is never below Poisson's
    # whenever the fit is overdispersed (k > 0)
    if row["overdispersed"] and k > 0:
        assert row["negbin_expected_zeros"] >= row["poisson_expected_zeros"] - 1e-6


def test_lexis_matches_chi2_identity(spark):
    row = QUERIES["agg_lexis_ratio"](spark, SF).first()
    days = {}
    for r in table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type = 'purchase' AS y"
    ).collect():
        n, s = days.get(r["d"], (0, 0))
        days[r["d"]] = (n + 1, s + r["y"])
    k = len(days)
    nt = sum(n for n, _ in days.values())
    st = sum(s for _, s in days.values())
    pbar = st / nt
    chi_num = sum(n * (s / n - pbar) ** 2 for n, s in days.values())
    q = chi_num / ((k - 1) * pbar * (1 - pbar))
    chi2 = chi_num / (pbar * (1 - pbar))
    assert row["n_days"] == k and row["n_events"] == nt
    assert abs(row["pooled_rate"] - pbar) < 1e-6
    assert abs(row["lexis_q"] - q) < 1e-4
    assert abs(row["chi2_homogeneity"] - chi2) < 1e-3
    assert row["supranormal"] == (q > 1)
    # the identity Lexis Q = chi2 / (k-1)
    assert abs(row["chi2_homogeneity"] - row["lexis_q"] * (k - 1)) < 1e-2
