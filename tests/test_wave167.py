"""Wave-167: padding-waste accounting, perplexity sanity, quantile
normalization alignment property."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_padding_waste_accounting(spark):
    rows = QUERIES["pipeline_padding_waste_buckets"](spark, SF).collect()
    assert rows
    naive = rows[0]["naive_waste"]
    for r in rows:
        # bucket cap is a power of two covering every doc in it
        assert r["bucket_cap"] & (r["bucket_cap"] - 1) == 0
        assert 0 <= r["bucket_waste"] < 1
        assert r["pad_tokens"] == r["n_docs"] * r["bucket_cap"] - r["real_tokens"]
        assert r["naive_waste"] == naive
    # overall bucketed waste strictly beats padding everything to max
    tot_pad = sum(r["pad_tokens"] for r in rows)
    tot_all = sum(r["pad_tokens"] + r["real_tokens"] for r in rows)
    assert tot_pad / tot_all < naive


def test_unigram_perplexity_sane(spark):
    r = QUERIES["text_unigram_perplexity_holdout"](spark, SF).collect()[0]
    assert r["n_heldout"] > 0
    assert abs(r["perplexity"] - round(math.exp(r["cross_entropy_nats"]), 4)) < 1e-2
    # perplexity must be >1 and below the smoothed-vocab worst case
    assert 1 < r["perplexity"]


def test_quantile_normalization_aligns_marginals(spark):
    rows = QUERIES["model_quantile_normalization"](spark, SF).collect()
    assert len(rows) >= 2
    pooled_min = (
        table(spark, SF, "documents").agg(F.min("n_chars")).collect()[0][0]
    )
    pooled_max = (
        table(spark, SF, "documents").agg(F.max("n_chars")).collect()[0][0]
    )
    mins = {r["min_normalized"] for r in rows}
    maxs = {r["max_normalized"] for r in rows}
    # after normalization every group's extremes hit the pooled range
    for mn in mins:
        assert abs(mn - pooled_min) < 1e-6
    for mx in maxs:
        assert abs(mx - pooled_max) < 1e-6
    # means were NOT aligned before (raw) but converge after
    raw_spread = max(r["mean_raw"] for r in rows) - min(r["mean_raw"] for r in rows)
    norm_spread = max(r["mean_normalized"] for r in rows) - min(
        r["mean_normalized"] for r in rows
    )
    assert norm_spread <= raw_spread
