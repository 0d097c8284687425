"""Wave-185: Shapiro-Francia vs numpy on the same Blom scores; Wilson
bound sanity + shrinkage; factless coverage conservation."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_shapiro_francia_matches_numpy(spark):
    row = QUERIES["agg_shapiro_francia"](spark, SF).collect()[0]
    from data_ingestor_web_app_spark.operators.wave185 import _BLOM, _SM2

    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    from collections import Counter

    x = np.sort(np.array(sorted(Counter(r["d"] for r in ev).values()), dtype=np.float64))
    assert row["n_days"] == 30 == len(x)  # the fixture invariant the literals rely on
    m = np.array(_BLOM)
    num = float(m @ x) ** 2
    den = _SM2 * float(((x - x.mean()) ** 2).sum())
    w = num / den
    assert abs(row["w_prime"] - w) < 1e-5, (row["w_prime"], w)
    assert 0.0 < row["w_prime"] <= 1.0001
    # Blom scores are symmetric and ordered
    assert all(a < b for a, b in zip(_BLOM, _BLOM[1:]))
    assert abs(_BLOM[0] + _BLOM[-1]) < 1e-12


def test_wilson_bound_shrinks_small_samples(spark):
    rows = QUERIES["model_wilson_score_ranking"](spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r["wilson_lb"] <= r["p_hat"] + 1e-12, r  # lower bound
        assert r["k_pos"] <= r["n_docs"]
        # closed-form check at 6dp
        p, n, z = r["k_pos"] / r["n_docs"], r["n_docs"], 1.96
        lb = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (
            1 + z * z / n
        )
        assert abs(r["wilson_lb"] - lb) < 1e-5
    rks = sorted(r["rk"] for r in rows)
    assert rks == list(range(1, len(rows) + 1))


def test_factless_coverage_conserves_grid(spark):
    rows = QUERIES["warehouse_factless_coverage"](spark, SF).collect()
    n_nations = table(spark, SF, "nation").count()
    brands = {
        r["p_brand"] for r in table(spark, SF, "part").select("p_brand").distinct().collect()
    }
    assert {r["p_brand"] for r in rows} == brands
    for r in rows:
        assert r["n_nations_covered"] + r["n_nations_missing"] == n_nations
        assert (r["first_missing_nation"] is None) == (r["n_nations_missing"] == 0)
