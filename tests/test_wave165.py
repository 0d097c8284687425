"""Wave-165: Bass fit vs numpy OLS; logistic fit audit; Schnabel identity
checks."""

from __future__ import annotations

import numpy as np

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _series(spark):
    from data_ingestor_web_app_spark.operators.wave165 import _adopt_spark

    return sorted(
        (r["d"], r["n_t"], r["cum_prev"])
        for r in _adopt_spark(spark, SF).collect()
    )


def test_bass_fit_matches_numpy(spark):
    r = QUERIES["events_bass_diffusion_fit"](spark, SF).collect()[0]
    pts = _series(spark)
    y = np.array([n for _, n, _ in pts], dtype=float)
    x1 = np.array([c for _, _, c in pts], dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x1 * x1])
    a, b, c = np.linalg.lstsq(X, y, rcond=None)[0]
    assert r["n_periods"] == len(pts)
    assert abs(r["coef_a"] - a) < 1e-3
    assert abs(r["coef_b"] - b) < 1e-5
    assert abs(r["coef_c"] - c) < 1e-6  # coef_c is ROUND(...,6)
    m = (-b - np.sqrt(b * b + 4 * (-c) * a)) / (2 * c)
    assert abs(r["m_hat"] - m) < 0.05 * abs(m)
    assert abs(r["p_hat"] - a / m) < 1e-4
    assert abs(r["q_hat"] - (b + a / m)) < 1e-4


def test_logistic_fit_sane(spark):
    r = QUERIES["events_logistic_growth_fit"](spark, SF).collect()[0]
    assert r["n_periods"] >= 3
    assert r["m_cap"] > 0
    assert 0.0 <= r["r2"] <= 1.0
    assert r["a_hat"] > 0


def test_schnabel_estimate_identities(spark):
    r = QUERIES["agg_schnabel_estimate"](spark, SF).collect()[0]
    assert r["n_hat"] == round(r["sum_cm"] / (r["sum_r"] + 1))
    assert r["true_universe"] > 0
    # heavy weekly revisit rates => the estimate should land near truth
    assert 0.5 * r["true_universe"] <= r["n_hat"] <= 2.0 * r["true_universe"]
