"""Wave-104 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_brier_murphy_identity(spark):
    r = QUERIES["model_brier_decomposition"](spark, SF_SMALL).first()
    # Murphy decomposition: brier = uncertainty - resolution + reliability
    assert abs(r.brier_score - (r.uncertainty - r.resolution + r.reliability)) < 5e-6
    assert 0 <= r.brier_score <= 1
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0 <= r.uncertainty <= 0.25
    # direct Brier recomputation
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select(
            F.round(F.col("l_discount") * 100).cast("long").alias("b"),
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
        )
        .toPandas()
    )
    direct = ((pdf["b"] / 10 - pdf["y"]) ** 2).mean()
    assert abs(r.brier_score - direct) < 1e-5


def test_logrank_statistic_sane(spark):
    r = QUERIES["events_logrank_test"](spark, SF_SMALL).first()
    assert r.variance >= 0
    assert r.logrank_chi2 >= 0
    if r.variance > 0:
        expect = r.observed_minus_expected ** 2 / r.variance
        assert abs(r.logrank_chi2 - expect) < 1e-3
        assert r.reject_equal_survival == (expect > 3.841459)
    else:
        assert not r.reject_equal_survival


def test_apportionment_sums_exactly(spark):
    rows = QUERIES["pipeline_token_apportionment"](spark, SF_SMALL).collect()
    # the defining property: budgets sum EXACTLY to 1,000,000 ppm
    assert sum(r.budget_ppm for r in rows) == 1_000_000
    total = sum(r.tokens for r in rows)
    for r in rows:
        exact = r.tokens * 1_000_000 / total
        # Hamilton apportionment stays within 1 seat of the exact quota
        assert abs(r.budget_ppm - exact) < 1.0
        assert r.got_remainder_seat == (r.budget_ppm == int(exact) + 1)
