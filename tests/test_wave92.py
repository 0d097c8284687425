"""Wave-92 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_poisson_bootstrap_brackets_point(spark):
    r = QUERIES["agg_poisson_bootstrap"](spark, SF_SMALL).first()
    assert r.ci_lo < r.point_mean_cents < r.ci_hi
    assert r.boot_se_cents > 0
    # bootstrap mean should sit near the point estimate relative to SE
    assert abs(r.boot_mean_cents - r.point_mean_cents) < 3 * r.boot_se_cents
    # SE of the mean should be in the ballpark of sigma/sqrt(n)
    pdf = table(spark, SF_SMALL, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents")
    ).toPandas()
    se_theory = pdf["cents"].std() / (len(pdf) ** 0.5)
    assert r.boot_se_cents < 6 * se_theory
    assert r.boot_se_cents > se_theory / 6


def test_did_is_interaction_of_cell_means(spark):
    r = QUERIES["events_diff_in_diff"](spark, SF_SMALL).first()
    did = (r.treated_post - r.treated_pre) - (r.control_post - r.control_pre)
    assert abs(r.did_estimate - did) < 2e-3
    for v in (r.treated_pre, r.treated_post, r.control_pre, r.control_post):
        assert v is not None


def test_boundary_overlap_full_recall(spark):
    r = QUERIES["dedup_boundary_overlap"](spark, SF_SMALL).first()
    # every constructed consecutive-chunk seam must be detected
    assert r.n_expected_seams > 0
    assert r.n_true_seams == r.n_expected_seams
    assert r.n_detected >= r.n_true_seams
