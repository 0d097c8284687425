"""Wave-68 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_shapley_efficiency_axiom(spark):
    """Shapley values must sum to v(grand coalition) - v(empty set)
    when every exposure set is observed — on this fixture every user
    touches all four channels, so the sum telescopes to v(full)."""
    rows = {r.channel: r.shapley_value for r in QUERIES["events_attribution_shapley"](spark, SF_SMALL).collect()}
    assert set(rows) == {"click", "error", "signup", "view"}
    e = table(spark, SF_SMALL, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
        F.countDistinct(
            F.when(F.col("event_type") != "purchase", F.col("event_type"))
        ).alias("k"),
    )
    full = per_user.where(F.col("k") == 4)
    v_full = full.agg(
        (F.sum("conv") * 1.0 / F.count("*")).alias("r")
    ).first().r
    # v(empty) uses users who touched no channel (none here -> 0)
    assert abs(sum(rows.values()) - v_full) < 1e-4


def test_rouge_scores_bounded_and_consistent(spark):
    rows = QUERIES["text_rouge_pairs"](spark, SF_SMALL).collect()
    assert len(rows) == 50
    for r in rows:
        assert 0 <= r.rouge1_precision <= 1
        assert 0 <= r.rouge1_recall <= 1
        # F1 is the harmonic mean: between min and max of P/R
        lo, hi = sorted((r.rouge1_precision, r.rouge1_recall))
        assert lo - 1e-9 <= r.rouge1_f1 <= hi + 1e-9
        assert r.id_b == r.id_a + 250
    # same 31-token vocab corpus: overlap must be substantial somewhere
    assert any(r.rouge1_f1 > 0.5 for r in rows)
