"""Wave-113 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_ransac_consensus_beats_any_candidate_pair(spark):
    r = QUERIES["model_ransac_line"](spark, SF_SMALL).first()
    assert 2 <= r.inliers <= r.n_points
    assert 0 < r.inlier_frac <= 1
    daily = (
        table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = np.array([row.x for row in daily], dtype=np.int64)
    t = np.arange(len(xs))
    # the winning line's inlier count is reproducible from its params
    pred = r.slope * t + r.intercept
    n_in = int((np.abs(xs - pred) <= 3 + 1e-6).sum())
    # allow rounding slack of the reported slope/intercept
    assert abs(n_in - r.inliers) <= 2


def test_empty_join_semantics_matrix(spark):
    rows = {r.variant: r.n_rows for r in QUERIES["join_empty_side_semantics"](spark, SF_SMALL).collect()}
    n = table(spark, SF_SMALL, "nation").count()
    assert rows["inner_vs_empty"] == 0
    assert rows["semi_vs_empty"] == 0
    assert rows["cross_vs_empty"] == 0
    assert rows["anti_vs_empty"] == n
    assert rows["left_outer_vs_empty"] == n
    assert rows["full_outer_vs_empty"] == n


def test_clipping_matches_formula(spark):
    rows = QUERIES["mm_audio_clipping"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows[:20]:
        nfr = 800 + (r.doc_id % 10) * 80
        s = np.abs(
            np.array([(i * (r.doc_id + 7)) % 2048 - 1024 for i in range(nfr)])
        )
        clipped = s >= 1020
        assert r.n_clipped == int(clipped.sum())
        starts = int((clipped & ~np.concatenate(([False], clipped[:-1]))).sum())
        assert r.n_clip_regions == starts
        assert abs(r.clipped_frac - clipped.sum() / nfr) < 1e-9
