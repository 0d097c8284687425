"""Wave-61 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.operators.wave61 import _ITEM_FACTORS, _LAMBDA
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_als_half_step_solves_normal_equations(spark):
    rows = {r.user_id: r for r in QUERIES["model_als_half_step"](spark, SF_SMALL).collect()}
    assert rows
    counts = (
        table(spark, SF_SMALL, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    by_user: dict[int, dict[str, int]] = {}
    for r in counts:
        by_user.setdefault(r.user_id, {})[r.event_type] = r.n
    for uid, obs in list(by_user.items())[:20]:
        a = sum(_ITEM_FACTORS[t][0] ** 2 for t in obs) + _LAMBDA
        b = sum(_ITEM_FACTORS[t][0] * _ITEM_FACTORS[t][1] for t in obs)
        c = sum(_ITEM_FACTORS[t][1] ** 2 for t in obs) + _LAMBDA
        d0 = sum(n * _ITEM_FACTORS[t][0] for t, n in obs.items())
        d1 = sum(n * _ITEM_FACTORS[t][1] for t, n in obs.items())
        det = a * c - b * b
        assert abs(rows[uid].x0 - (c * d0 - b * d1) / det) < 1e-5
        assert abs(rows[uid].x1 - (a * d1 - b * d0) / det) < 1e-5


def test_neyman_allocation_sums_to_budget(spark):
    rows = QUERIES["sample_neyman_allocation"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert sum(r.n_sample for r in rows) == 1000
    for r in rows:
        # largest-remainder keeps every stratum within 1 of its ideal
        assert abs(r.n_sample - r.ideal_alloc) < 1.0 + 1e-9


def test_bh_rejection_set_is_a_p_value_prefix(spark):
    rows = sorted(
        QUERIES["agg_benjamini_hochberg"](spark, SF_SMALL).collect(),
        key=lambda r: r.bh_rank,
    )
    assert len(rows) == 25
    # rejected rows form a prefix of the p-sorted list
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)
    for r in rows:
        assert 0 <= r.p <= 1
        if r.rejected:
            assert r.p <= 0.10 * r.bh_rank / 25 + 1e-9
