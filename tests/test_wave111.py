"""Wave-111 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_bowley_skewness_matches_numpy(spark):
    r = QUERIES["agg_bowley_skewness"](spark, SF_SMALL).first()
    vals = sorted(
        round(row.o_totalprice * 100)
        for row in table(spark, SF_SMALL, "orders").collect()
    )
    n = len(vals)
    q1 = vals[(n + 3) // 4 - 1]
    q2 = vals[(n + 1) // 2 - 1]
    q3 = vals[(3 * n + 1) // 4 - 1]
    assert abs(r.q1_value - q1 / 100) < 0.02
    assert abs(r.median_value - q2 / 100) < 0.02
    assert abs(r.q3_value - q3 / 100) < 0.02
    expect = (q1 + q3 - 2 * q2) / (q3 - q1)
    assert abs(r.bowley_skewness - expect) < 1e-5
    assert -1 <= r.bowley_skewness <= 1


def test_junk_dimension_covers_facts(spark):
    rows = QUERIES["warehouse_junk_dimension"](spark, SF_SMALL).collect()
    n_orders = table(spark, SF_SMALL, "orders").count()
    assert sum(r.n_facts for r in rows) == n_orders
    keys = [r.junk_key for r in rows]
    assert keys == list(range(1, len(rows) + 1))
    # surrogate ordering matches (status, priority) lexicographic
    pairs = [(r.o_orderstatus, r.o_orderpriority) for r in rows]
    assert pairs == sorted(pairs)


def test_lorenz_asymmetry_identities(spark):
    r = QUERIES["agg_lorenz_asymmetry"](spark, SF_SMALL).first()
    vals = np.array(
        [round(row.o_totalprice * 100) for row in table(spark, SF_SMALL, "orders").collect()],
        dtype=np.int64,
    )
    below = vals[vals * len(vals) < vals.sum()]
    assert abs(r.f_mu - len(below) / len(vals)) < 1e-5
    assert abs(r.l_mu - below.sum() / vals.sum()) < 1e-5
    assert abs(r.lorenz_asymmetry - (r.f_mu + r.l_mu)) < 2e-6
    # L(mu) <= F(mu) always (below-mean values earn less than their share)
    assert r.l_mu <= r.f_mu + 1e-9
    assert r.inequality_from_large_values == (r.lorenz_asymmetry > 1)
