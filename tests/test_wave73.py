"""Wave-73 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_auc_matches_sklearn_free_reference(spark):
    """Cross-check the rank AUC against a brute-force pair count."""
    import pyspark.sql.functions as F

    from data_ingestor_web_app_spark.io import table

    r = QUERIES["model_auc_roc"](spark, SF_SMALL).first()
    rows = (
        table(spark, SF_SMALL, "orders")
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("s"),
            (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        )
        .collect()
    )
    pos = sorted(x.s for x in rows if x.y)
    neg = sorted(x.s for x in rows if not x.y)
    assert r.n_pos == len(pos) and r.n_neg == len(neg)
    import bisect

    wins = ties = 0
    for p in pos:
        wins += bisect.bisect_left(neg, p)
        ties += bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
    brute = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(r.auc - brute) < 1e-5
    assert 0 <= r.auc <= 1


def test_keyframes_one_per_scene(spark):
    rows = QUERIES["mm_keyframe_select"](spark, SF_SMALL).collect()
    per_clip: dict[int, list] = {}
    for r in rows:
        per_clip.setdefault(r.clip_id, []).append(r)
    assert len(per_clip) == 40
    for clip_id, rs in per_clip.items():
        cut_len = 4 + clip_id % 3
        expected = [(i, f) for i, f in enumerate(range(0, 12, cut_len))]
        got = sorted((r.scene_idx, r.keyframe_idx) for r in rs)
        assert got == expected, (clip_id, got)
        for r in rs:
            assert 0 <= r.mean_intensity <= 255
