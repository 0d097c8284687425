"""Wave-100 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_median_polish_decomposition(spark):
    rows = QUERIES["agg_median_polish"](spark, SF_SMALL).collect()
    # sf0.001 has few odd-count complete rows; at least one must survive
    assert len(rows) >= 1
    for r in rows:
        for v in (r.row_effect_cents, r.resid_f, r.resid_o, r.resid_p):
            assert v is None or isinstance(v, int)
        # residuals in each row should be "polished": the row's lower
        # median residual is 0 after the final row sweep... the final
        # sweep is a COLUMN sweep, so assert instead that residual
        # magnitudes are far below the raw cell magnitudes (polish
        # removed the structure)
        resids = [v for v in (r.resid_f, r.resid_o, r.resid_p) if v is not None]
        assert resids
    med_abs = sorted(abs(v) for r in rows for v in (r.resid_f, r.resid_o, r.resid_p) if v is not None)
    typical_resid = med_abs[len(med_abs) // 2]
    raw_cells = (
        table(spark, SF_SMALL, "orders")
        .agg(F.expr("percentile_approx(o_totalprice, 0.5)"))
        .first()[0]
        * 100
    )
    assert typical_resid < raw_cells  # structure removed vs raw scale


def test_blocking_quality_perfect_recall(spark):
    r = QUERIES["dedup_blocking_quality"](spark, SF_SMALL).first()
    # edit distance <= 1 leaves one half intact -> PC must be exactly 1
    assert r.n_true > 0
    assert r.pair_completeness == 1.0
    # sf0.001 has 10 suppliers named SUPPLIER_0..9 — every pair is a true
    # edit-distance-1 pair and blocking can prune nothing; at larger SFs
    # the reduction ratio becomes strictly positive
    assert 0 <= r.reduction_ratio < 1
    if r.n_items > 50:
        assert r.reduction_ratio > 0.5
    assert r.n_found <= r.n_candidates


def test_iv_wald_identity(spark):
    r = QUERIES["model_iv_2sls"](spark, SF_SMALL).first()
    # Wald estimator = reduced form / first stage (unit conversions:
    # beta is per 1e6 cents; first stage is in dollars = cents/100)
    beta_recovered = r.reduced_form_effect / (r.first_stage_effect * 100) * 1e6
    assert abs(beta_recovered - r.beta_iv_per_1e6) / max(abs(r.beta_iv_per_1e6), 1e-9) < 0.01
    assert r.n == table(spark, SF_SMALL, "orders").count()
