"""Wave-35 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_ccnet_buckets_tercile_balance(spark):
    rows = QUERIES["pipeline_ccnet_buckets"](spark, SF_SMALL).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        # head has the LOWEST nll (best quality), tail the highest
        assert buckets["head"].mean_nll <= buckets["middle"].mean_nll <= buckets["tail"].mean_nll
        ns = sorted(b.n_docs for b in buckets.values())
        assert ns[-1] - ns[0] <= max(3, ns[-1] // 3)  # roughly tercile-balanced


def test_epoch_caps_effective_tokens_bounded(spark):
    rows = QUERIES["pipeline_mixture_epoch_caps"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.epochs_capped <= 4.0
        assert r.effective_tokens <= 4 * r.tokens
        if r.was_capped:
            assert r.epochs_capped == 4.0


def test_bpe_two_rounds_monotone_and_distinct_merges(spark):
    row = QUERIES["text_bpe_train_2rounds"](spark, SF_SMALL).first()
    assert row.tokens_before > row.tokens_after_r1 > row.tokens_after_r2
    assert row.merge1 != row.merge2
    # each merge removes exactly n occurrences' worth of tokens
    assert row.tokens_before - row.tokens_after_r1 == row.n1
    assert row.tokens_after_r1 - row.tokens_after_r2 == row.n2


def test_partition_stats_cover_all_days(spark):
    rows = QUERIES["maintenance_partition_stats"](spark, SF_SMALL).collect()
    total = sum(r.n_rows for r in rows)
    assert total == table(spark, SF_SMALL, "events").count()
    for r in rows:
        assert r.min_vc <= r.max_vc
        assert r.n_users >= 1
