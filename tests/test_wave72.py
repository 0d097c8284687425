"""Wave-72 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_kappa_confusion_matrix_consistent(spark):
    r = QUERIES["pipeline_cohens_kappa"](spark, SF_SMALL).first()
    assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
    assert abs(r.observed_agreement - (r.n11 + r.n00) / r.n) < 1e-5
    assert -1 <= r.kappa <= 1
    # kappa is chance-corrected: sits below raw agreement when pe > 0
    assert r.kappa <= r.observed_agreement + 1e-9


def test_elasticity_regime_matches_sign(spark):
    r = QUERIES["model_price_elasticity"](spark, SF_SMALL).first()
    assert r.n_obs > 0
    if r.elasticity < -1:
        assert r.regime == "elastic"
    elif r.elasticity < 0:
        assert r.regime == "inelastic"
    else:
        assert r.regime == "non_negative"


def test_ssim_separates_luminance_from_structure(spark):
    rows = QUERIES["mm_image_ssim_global"](spark, SF_SMALL).collect()
    assert len(rows) == 100
    for r in rows:
        # pure +40 brightness shift: structure preserved, luminance hit
        assert r.structure_term > 0.999
        assert r.luminance_term < 0.99
        assert 0 < r.luminance_term <= 1 and r.structure_term <= 1 + 1e-9
