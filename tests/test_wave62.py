"""Wave-62 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_dim_refresh_sees_three_versions(spark):
    rows = QUERIES["stream_dim_refresh_join"](spark, SF_SMALL).collect()
    versions = {r.dim_version for r in rows}
    assert versions == {0, 1, 2}  # each micro-batch used its own dim
    # every event is enriched exactly once
    n_events = table(spark, SF_SMALL, "events").count()
    assert sum(r.n for r in rows) == n_events
    # later versions scale the multiplier: same type, higher version =>
    # larger per-event enrichment on average
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.dim_version] = (
            r.enriched_cents / r.n
        )
    for t, per_v in by_type.items():
        if 0 in per_v and 2 in per_v:
            assert per_v[2] > per_v[0], t


def test_preference_pairs_have_real_margins(spark):
    rows = QUERIES["pipeline_preference_pairs"](spark, SF_SMALL).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.margin >= 0.05
        assert r.chosen_id != r.rejected_id
        assert 1 <= r.pair_rank <= 3
        key = (r.source, r.pair_rank)
        assert key not in seen  # one pair per (source, rank)
        seen.add(key)
