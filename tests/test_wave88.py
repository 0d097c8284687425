"""Wave-88 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_stylometry_delta_symmetric_nonneg(spark):
    rows = QUERIES["text_stylometry_delta"](spark, SF_SMALL).collect()
    sources = {
        r.source for r in table(spark, SF_SMALL, "documents").select("source").distinct().collect()
    }
    k = len(sources)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r.burrows_delta >= 0
        assert r.source_a < r.source_b
    # z-scores across sources have mean 0 for each marker, so deltas are
    # bounded by the max spread of a standardized variable
    assert max(r.burrows_delta for r in rows) < 2 * (k ** 0.5)


def test_cramers_v_range_and_chi2(spark):
    r = QUERIES["agg_cramers_v"](spark, SF_SMALL).first()
    assert 0 <= r.cramers_v <= 1
    assert r.chi2_stat >= 0
    # V = sqrt(chi2 / (n * min(r-1, c-1)))
    expect = (r.chi2_stat / (r.n * min(r.r - 1, r.c - 1))) ** 0.5
    assert abs(r.cramers_v - expect) < 1e-5
    # n equals the joined row count
    assert r.n == table(spark, SF_SMALL, "orders").count()


def test_freshness_lag_identities(spark):
    rows = QUERIES["dq_freshness_lag"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    # exactly the freshest type(s) have zero lag
    lags = [r.lag_minutes for r in rows]
    assert min(lags) == 0
    for r in rows:
        assert r.lag_minutes >= 0
        assert r.stale == (r.lag_minutes > 1440)
    # counts cover the whole feed
    assert sum(r.n_events for r in rows) == table(spark, SF_SMALL, "events").count()
