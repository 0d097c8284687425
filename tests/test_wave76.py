"""Wave-76 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_covariate_balance_aa_split_is_balanced(spark):
    rows = QUERIES["events_covariate_balance"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    # sf0.001 strata hold ~3 users: a stratum can land entirely in one
    # arm, in which case SMD is NULL ("cannot assess") — both engines
    # agree on that by construction
    scored = [r for r in rows if r.smd is not None]
    assert scored
    for r in scored:
        assert r.balanced == (abs(r.smd) < 0.1)


def test_time_travel_versions_reconcile(spark):
    rows = QUERIES["maintenance_time_travel_read"](spark, SF_SMALL).collect()
    o = table(spark, SF_SMALL, "orders")
    per_status = {
        r.o_orderstatus: r.n for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r.n_v0 == per_status[r.o_orderstatus]
        assert r.n_v1 == r.n_v0  # restatement edits rows, deletes none
        assert r.n_v2 <= r.n_v1  # the purge only removes
        assert r.cents_v1 > 0
