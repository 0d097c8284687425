"""Wave-67 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_tukey_fences_nest(spark):
    rows = QUERIES["agg_tukey_outliers"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.q1_usd <= r.q3_usd
        assert 0 <= r.n_extreme <= r.n_outliers <= r.n


def test_association_metrics_are_consistent(spark):
    rows = QUERIES["events_association_lift"](spark, SF_SMALL).collect()
    assert len(rows) == 10  # C(5,2) unordered type pairs
    for r in rows:
        assert r.ante < r.cons
        assert 0 < r.support <= 1
        assert r.support <= r.confidence <= 1
        assert r.lift > 0
        # lift and confidence relate through the consequent base rate:
        # lift = confidence / P(cons), so confidence > support => lift sane
        assert r.n_ab > 0


def test_token_pooling_invariants(spark):
    rows = QUERIES["sim_token_pooling"](spark, SF_SMALL).collect()
    emb = {
        r.vec_id: r.embedding
        for r in table(spark, SF_SMALL, "embeddings")
        .where(F.col("vec_id") < 100)
        .collect()
    }
    assert len(rows) == len(emb) * 8
    for r in rows[:80]:
        v = emb[r.vec_id]
        col = [float(v[t * 8 + r.dim]) for t in range(8)]
        assert abs(r.mean_pool - sum(col) / 8) < 1e-4
        assert abs(r.max_pool - max(col)) < 1e-4
        assert abs(r.cls_pool - float(v[r.dim])) < 1e-4
        assert r.mean_pool <= r.max_pool + 1e-9
