"""Wave-75 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_phash_pairs_find_brightness_shifted_siblings(spark):
    rows = QUERIES["mm_phash_dedup_pairs"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.id_a < r.id_b
        assert 0 <= r.hamming <= 6
        assert r.exact_dup == (r.hamming == 0)
    # genuine perceptual collisions exist even though every image's
    # BYTES differ (that asymmetry is the point of perceptual hashing)
    assert any(r.exact_dup for r in rows)
    # banding guarantee: every reported pair agrees on at least one half
    from data_ingestor_web_app_spark.llm.multimodal import mm_phash

    h = {
        r.doc_id: (r.dhash_lo, r.dhash_hi)
        for r in mm_phash(spark, SF_SMALL).collect()
    }
    for r in rows[:100]:
        la, ha = h[r.id_a]
        lb, hb = h[r.id_b]
        assert la == lb or ha == hb


def test_bounce_rate_reconciles_sessionization(spark):
    rows = QUERIES["events_bounce_rate"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert abs(r.bounce_rate - r.n_bounces / r.n_sessions) < 1e-5
    # total sessions across days can't exceed total events
    n_events = table(spark, SF_SMALL, "events").count()
    assert sum(r.n_sessions for r in rows) <= n_events
