"""Wave-78 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_gmm_em_step_sane(spark):
    r = QUERIES["model_gmm_em_step"](spark, SF_SMALL).first()
    assert 0 < r.weight_1 < 1
    # components keep their ordering after one step from mu1 < mu2 init
    assert r.mu_1 < r.mu_2
    assert r.sigma_1 > 0
    # both means stay inside the observed value range
    lo, hi = (
        table(spark, SF_SMALL, "orders")
        .agg(F.min("o_totalprice"), F.max("o_totalprice"))
        .first()
    )
    assert lo <= r.mu_1 <= hi and lo <= r.mu_2 <= hi


def test_not_in_null_annihilation(spark):
    rows = {r.variant: r.n_rows for r in QUERIES["join_not_in_null_semantics"](spark, SF_SMALL).collect()}
    # a NULL in the NOT IN list empties the result — the trap itself
    assert rows["not_in_with_null"] == 0
    # NOT EXISTS is null-immune and equals the clean NOT IN
    assert rows["anti_join"] == rows["not_in_clean"]
    n_customers = table(spark, SF_SMALL, "customer").count()
    assert 0 <= rows["not_in_clean"] <= n_customers
