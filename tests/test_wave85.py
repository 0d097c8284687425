"""Wave-85 semantic checks."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_item_cosine_topk_matches_bruteforce(spark):
    rows = QUERIES["model_item_cosine_topk"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 50
    baskets = {}
    for r in (
        table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        baskets.setdefault(r.l_partkey, set()).add(r.l_orderkey)
    for r in rows:
        inter = len(baskets[r.pa] & baskets[r.pb])
        assert r.nab == inter
        assert inter >= 2
        expect = inter / math.sqrt(len(baskets[r.pa]) * len(baskets[r.pb]))
        assert abs(r.cosine - expect) < 1e-5
    scores = [r.cosine for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_process_capability_formulas(spark):
    rows = QUERIES["agg_process_capability"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.cp > 0 and r.cpk > 0
        # cpk <= cp always; equality iff perfectly centered
        assert r.cpk <= r.cp + 1e-9
        assert abs(r.cp - 55.0 / (6 * r.sigma_qty)) < 1e-3
        assert abs(
            r.cpk - min(55.0 - r.mean_qty, r.mean_qty) / (3 * r.sigma_qty)
        ) < 1e-3


def test_audience_overlap_set_identities(spark):
    rows = QUERIES["events_audience_overlap"](spark, SF_SMALL).collect()
    # 5 event types -> 10 unordered pairs
    assert len(rows) == 10
    aud = {}
    for r in table(spark, SF_SMALL, "events").select("event_type", "user_id").distinct().collect():
        aud.setdefault(r.event_type, set()).add(r.user_id)
    for r in rows:
        inter = len(aud[r.ta] & aud[r.tb])
        assert r.n_both == inter
        assert r.n_a == len(aud[r.ta]) and r.n_b == len(aud[r.tb])
        union = len(aud[r.ta] | aud[r.tb])
        assert abs(r.jaccard - inter / union) < 1e-6
        assert abs(r.containment - inter / min(r.n_a, r.n_b)) < 1e-6
        assert r.jaccard <= r.containment + 1e-9
