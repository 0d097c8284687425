"""Wave-145: Little's law identity, fill-rate bounds, EOQ optimality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_littles_law_identity_holds(spark):
    r = QUERIES["events_littles_law"](spark, SF).collect()[0]
    # the sweep-line L and the law's lambda*W MUST agree exactly
    assert r["l_sweep_micro"] == r["l_law_micro"]
    assert r["n_sessions"] > 0 and r["span_ms"] > 0
    lam_ms = r["n_sessions"] / r["span_ms"]
    w = r["total_dur_ms"] / r["n_sessions"]
    assert abs(r["l_law_micro"] / 1e6 - lam_ms * w) < 1e-3


def test_fill_rate_bounds_and_stockouts(spark):
    rows = QUERIES["events_fill_rate"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["fill_rate"] <= 1.0
        assert r["filled"] <= r["total_demand"]
        # 0.9-fractile stock: at most ~10% + ties of days stock out
        n_days = QUERIES["events_newsvendor_stock"](spark, SF).collect()
        assert r["stockout_days"] >= 0


def test_eoq_minimizes_total_cost(spark):
    rows = QUERIES["inventory_eoq"](spark, SF).collect()
    assert rows
    for r in rows[:10]:
        d, q = r["demand"], r["eoq"]
        assert abs(q - math.sqrt(2 * d * 100 / 2)) < 1e-2

        def cost(qq):
            return d / qq * 100 + qq / 2 * 2

        # EOQ beats +-10% perturbations
        assert cost(q) <= cost(q * 1.1) + 1e-6
        assert cost(q) <= cost(q * 0.9) + 1e-6
