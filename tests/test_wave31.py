"""Wave-31 semantic checks (filesystem effects and format plumbing the
oracle hash can't see)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_vacuum_orphans_removes_unmanifested_dirs(spark, tmp_path):
    from data_ingestor_web_app_spark.operators.wave31 import maintenance_vacuum_orphans

    out = maintenance_vacuum_orphans(spark, SF_SMALL)
    buckets = sorted(r.bucket for r in out.collect())
    assert buckets == [0, 2, 3, 5, 7]  # exactly the manifest


def test_session_window_batch_sessions_are_disjoint(spark):
    rows = QUERIES["agg_session_window_batch"](spark, SF_SMALL).collect()
    per_user_events = dict(
        table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = {}
    for r in rows:
        got[r.user_id] = got.get(r.user_id, 0) + r.n_events
        assert r.span_us >= 0
    assert got == per_user_events  # sessions partition each user's events


def test_image_convolution_energy_positive_and_bounded(spark):
    rows = QUERIES["mm_image_convolution"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_interior > 0
        # |laplacian| per pixel is at most 4*255 + 4*255
        assert 0 <= r.edge_energy <= r.n_interior * 8 * 255
