"""Wave-101 semantic checks."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_hill_matches_bruteforce(spark):
    r = QUERIES["model_hill_tail_index"](spark, SF_SMALL).first()
    cents = sorted(
        (
            int(round(row.o_totalprice * 100))
            for row in table(spark, SF_SMALL, "orders").collect()
        ),
        reverse=True,
    )[:100]
    xk = min(cents)
    gamma = sum(math.log(c / xk) for c in cents) / (len(cents) - 1)
    assert r.k == len(cents)
    assert abs(r.hill_gamma - gamma) < 1e-5
    assert abs(r.tail_alpha - 1 / gamma) < 1e-3
    assert r.hill_gamma > 0


def test_conformal_coverage_near_nominal(spark):
    r = QUERIES["model_conformal_interval"](spark, SF_SMALL).first()
    assert r.n_test > 0
    assert r.qhat_cents > 0
    # split conformal guarantees >= 90% expected coverage; allow finite-
    # sample slack of 4/sqrt(n)
    assert r.coverage >= 0.9 - 4 / (r.n_test ** 0.5)
    assert r.coverage <= 1.0
    assert abs(r.interval_width_dollars - 2 * r.qhat_cents / 100) < 0.02


def test_dup_rate_by_source_identities(spark):
    rows = QUERIES["pipeline_dup_rate_by_source"](spark, SF_SMALL).collect()
    total_docs = table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == total_docs
    for r in rows:
        assert r.n_unique <= r.n_docs
        assert r.n_dup_docs == r.n_docs - r.n_unique
        assert abs(r.dup_rate - r.n_dup_docs / r.n_docs) < 1e-6
