"""Wave-57 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_heavy_hitters_equal_naive_groupby(spark):
    got = {
        (r.bigram, r.n)
        for r in QUERIES["agg_heavy_hitters_mg"](spark, SF_SMALL).collect()
    }
    d = table(spark, SF_SMALL, "documents")
    grams = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(0, size(split(text, ' ')) - 2), "
                "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i+1])) "
                "ELSE array() END"
            )
        ).alias("g")
    )
    total = grams.count()
    naive = {
        (r.g, r.n)
        for r in grams.groupBy("g")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > total / 750.0)
        .collect()
    }
    assert got == naive and got  # sketch+recount is EXACT, not approximate


def test_funnel_windowed_monotone_stages(spark):
    r = QUERIES["events_funnel_windowed"](spark, SF_SMALL).first()
    assert r.n_view >= r.n_click_24h >= r.n_purchase_24h
    assert r.n_purchase_24h >= 0
    if r.n_click_24h:
        assert 0 < r.median_gap_view_click_sec <= 86400
    if r.n_purchase_24h:
        assert 0 < r.median_gap_click_purchase_sec <= 86400


def test_consistent_hash_moves_less_than_mod(spark):
    r = QUERIES["pipeline_consistent_hash_router"](spark, SF_SMALL).first()
    n_docs = table(spark, SF_SMALL, "documents").count()
    assert r.n_docs == n_docs
    # mod-N churns almost everything on 16 -> 20; the ring moves roughly
    # the 4/20 of keyspace the new shards claim
    assert r.mod_moved_frac > 0.7  # theoretical churn is 64/80 = 0.8
    assert r.ring_moved_frac < 0.5
    assert r.moved_ring < r.moved_mod
