"""Wave-59 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_recall_curve_monotone_in_nprobe(spark):
    rows = {r.nprobe: r for r in QUERIES["sim_ann_recall_curve"](spark, SF_SMALL).collect()}
    assert set(rows) == {1, 2, 4}
    # more probed lists can only add candidates -> recall is monotone
    assert rows[1].recall_at_10 <= rows[2].recall_at_10 <= rows[4].recall_at_10
    for r in rows.values():
        assert 0 <= r.recall_at_10 <= 1
        assert r.n_queries == 20


def test_interrupted_time_series_identity(spark):
    r = QUERIES["events_interrupted_time_series"](spark, SF_SMALL).first()
    # the reported deltas must be consistent with the per-segment fits
    assert abs(
        r.trend_change - (r.post_slope - r.pre_slope)
    ) < 1e-5
    assert abs(
        r.level_change_at_cut
        - (
            (r.post_intercept + r.post_slope * 14)
            - (r.pre_intercept + r.pre_slope * 14)
        )
    ) < 1e-4
