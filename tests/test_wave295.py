"""Wave-295: BHEP statistic vs a raw python replay; Chauvenet flags vs the
REAL math.erfc (the query uses the A&S 7.1.26 polynomial)."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_bhep_matches_python_replay(spark):
    row = QUERIES["agg_epps_pulley"](spark, SF).first()
    days = {}
    for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect():
        days[r["d"]] = days.get(r["d"], 0) + 1
    xs = list(days.values())
    n = len(xs)
    mu = sum(xs) / n
    sd = math.sqrt(sum(x * x for x in xs) / n - mu * mu)
    ys = [(x - mu) / sd for x in xs]
    s_pair = sum(math.exp(-((a - b) ** 2) / 2) for a in ys for b in ys)
    s_one = sum(math.exp(-y * y / 4) for y in ys)
    t = s_pair / n - math.sqrt(2) * s_one + n / math.sqrt(3)
    assert row["n_days"] == n
    assert abs(row["pair_term"] - s_pair / n) < 1e-5
    assert abs(row["one_term"] - math.sqrt(2) * s_one) < 1e-5
    assert abs(row["bhep_t"] - t) < 1e-5
    # BHEP is a weighted L2 distance between characteristic functions
    assert row["bhep_t"] >= 0


def test_chauvenet_flags_match_exact_erfc(spark):
    row = QUERIES["agg_chauvenet_outliers"](spark, SF).first()
    cs = [
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    ]
    n = len(cs)
    mu = sum(cs) / n
    sd = math.sqrt(sum(c * c for c in cs) / n - mu * mu)
    zs = [abs(c - mu) / sd for c in cs]
    flags = [n * math.erfc(z / math.sqrt(2)) < 0.5 for z in zs]
    assert row["n_obs"] == n
    assert row["n_flagged"] == sum(flags)
    assert abs(row["max_z"] - max(zs)) < 1e-6
    if sum(flags):
        assert abs(
            row["min_flagged_z"] - min(z for z, f in zip(zs, flags) if f)
        ) < 1e-6
    else:
        assert row["min_flagged_z"] is None
    # the A&S polynomial the engines use stays within its published bound
    for z in [0.1, 0.7, 1.3, 2.2, 3.5, 4.8]:
        t = 1.0 / (1.0 + 0.3275911 * z)
        approx = (
            t
            * (
                0.254829592
                + t
                * (
                    -0.284496736
                    + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
                )
            )
            * math.exp(-z * z)
        )
        assert abs(approx - math.erfc(z)) < 1.5e-7
