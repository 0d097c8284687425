"""Wave-112 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_confusion_matrix_identities(spark):
    r = QUERIES["model_confusion_matrix"](spark, SF_SMALL).first()
    n = table(spark, SF_SMALL, "lineitem").count()
    assert r.tp + r.fp + r.fn + r.tn == n
    p = r.tp / (r.tp + r.fp)
    rec = r.tp / (r.tp + r.fn)
    assert abs(r.precision_ - p) < 1e-5
    assert abs(r.recall_ - rec) < 1e-5
    f1 = 2 * p * rec / (p + rec)
    assert abs(r.f1 - f1) < 1e-4
    assert -1 <= r.mcc <= 1


def test_hrw_beats_modulo(spark):
    r = QUERIES["pipeline_ring_rebalance_audit"](spark, SF_SMALL).first()
    # rendezvous hashing's whole point: far fewer keys move
    assert r.hrw_move_frac < r.modulo_move_frac
    # modulo 4->5 moves ~4/5 of keys; HRW the minimal ~1/5
    assert 0.6 < r.modulo_move_frac < 0.95
    assert 0.05 < r.hrw_move_frac < 0.4
    assert r.moved_hrw <= r.n_keys and r.moved_modulo <= r.n_keys


def test_audience_stability_bounds(spark):
    rows = QUERIES["events_audience_stability"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.retained_users <= min(r.week1_users, r.week2_users)
        assert 0 <= r.jaccard_stability <= 1
        assert 0 <= r.retention_share <= 1
        # retention share >= jaccard always (smaller denominator)
        assert r.retention_share >= r.jaccard_stability - 1e-9
