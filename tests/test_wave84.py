"""Wave-84 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_pca_matches_numpy_eig(spark):
    r = QUERIES["model_pca_closed_form"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        )
        .toPandas()
    )
    cov = np.cov(pdf["q"], pdf["d"], bias=True)
    vals, vecs = np.linalg.eigh(cov)
    l1, l2 = vals[1], vals[0]
    assert abs(r.explained_ratio - l1 / (l1 + l2)) < 1e-5
    v1 = vecs[:, 1]
    slope = v1[1] / v1[0]
    assert abs(r.pc1_slope - slope) < 1e-4
    assert abs(r.corr_xy - np.corrcoef(pdf["q"], pdf["d"])[0, 1]) < 1e-5
    assert 0.5 <= r.explained_ratio <= 1.0


def test_randomized_response_estimator_close(spark):
    r = QUERIES["privacy_randomized_response"](spark, SF_SMALL).first()
    # the estimator is unbiased; with a fair hash coin the error at n
    # respondents is O(1/sqrt(n))
    assert abs(abs(r.estimated_rate - r.true_rate) - r.abs_error) < 2e-6
    assert r.abs_error < 4.0 / (r.n ** 0.5)
    # reported rate is pushed toward 1/2 relative to truth by the noise arm
    assert abs(r.reported_rate - (0.5 * r.true_rate + 0.25)) < 4.0 / (r.n ** 0.5)


def test_zcr_matches_formula(spark):
    rows = QUERIES["mm_audio_zcr"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        n = 800 + (r.doc_id % 10) * 80
        s = np.array([(i * (r.doc_id + 7)) % 2048 - 1024 for i in range(n)])
        expect = int(((s[:-1] * s[1:]) < 0).sum())
        assert r.n_crossings == expect
        assert abs(r.zcr - expect / (n - 1)) < 1e-6
        assert 0 <= r.zcr <= 1
