"""Wave-63 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_scene_cuts_land_on_scene_boundaries(spark):
    rows = QUERIES["mm_scene_cut_detect"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        cut_len = 4 + r.clip_id % 3
        expected_cut = (r.frame_idx % cut_len) == 0  # frame f starts a new scene
        assert r.is_cut == expected_cut, (r, cut_len)
        if r.is_cut:
            assert r.mean_delta > 32
        else:
            assert r.mean_delta < 8  # smooth drift is tiny


def test_matryoshka_recall_monotone_with_identity_anchor(spark):
    rows = {r.dim: r for r in QUERIES["sim_matryoshka_prefix_recall"](spark, SF_SMALL).collect()}
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].recall_at_10 == 1.0  # identity anchor
    assert rows[8].recall_at_10 <= rows[64].recall_at_10
    for r in rows.values():
        assert 0 <= r.recall_at_10 <= 1 and r.n_queries == 20


def test_ece_is_weighted_mean_of_gaps(spark):
    rows = QUERIES["model_calibration_ece"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n for r in rows)
    weighted = sum(r.gap * r.n for r in rows) / total
    for r in rows:
        assert abs(r.ece - weighted) < 1e-4
        assert 0 <= r.avg_conf <= 1 and 0 <= r.frac_pos <= 1
