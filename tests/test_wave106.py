"""Wave-106 semantic checks."""

from __future__ import annotations

import math
from datetime import date, timedelta

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_bitemporal_version_is_latest_eligible(spark):
    rows = QUERIES["join_bitemporal_asof"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    epoch = date(1995, 1, 1)
    for r in rows[:50]:
        bt = date.fromisoformat(r.business_time)
        observed = bt + timedelta(days=14)
        # reconstruct the eligible version set and its argmax
        supp = r.cost_cents // 1000
        best = None
        for v in range(8):
            valid_from = epoch + timedelta(days=90 * v)
            lag = 30 if v % 3 == 2 else 7
            tx_from = valid_from + timedelta(days=lag)
            if valid_from <= bt and tx_from <= observed:
                best = v
        assert best is not None
        assert r.version_valid_from == (epoch + timedelta(days=90 * best)).isoformat()
        assert r.cost_cents == supp * 1000 + best * 17
        # a late correction (v%3==2) whose tx lag exceeds the observation
        # horizon must never be chosen over an earlier recorded version
        chosen_v = (r.cost_cents - supp * 1000) // 17
        lag = 30 if chosen_v % 3 == 2 else 7
        assert epoch + timedelta(days=90 * chosen_v + lag) <= observed


def test_sprt_decision_is_first_crossing(spark):
    r = QUERIES["events_sprt_monitor"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("e"),
            F.count("*").alias("n"),
        )
        .orderBy("day")
        .collect()
    )
    hit = round(math.log(0.25 / 0.18) * 1e6)
    miss = round(math.log(0.75 / 0.82) * 1e6)
    a, b = round(math.log(19) * 1e6), round(math.log(1 / 19) * 1e6)
    llr = 0
    decision_day = None
    verdict = None
    for row in daily:
        llr += row.e * hit + (row.n - row.e) * miss
        if llr >= a:
            decision_day, verdict = row.day.isoformat(), "accept_h1"
            break
        if llr <= b:
            decision_day, verdict = row.day.isoformat(), "accept_h0"
            break
    assert r.decision_day == decision_day
    assert r.decision == verdict
    assert abs(r.llr_at_decision - llr / 1e6) < 1e-5


def test_hard_negatives_cross_label(spark):
    rows = QUERIES["sim_hard_negatives"](spark, SF_SMALL).collect()
    labels = {r.vec_id: r.label for r in table(spark, SF_SMALL, "embeddings").collect()}
    assert len(rows) == 15
    for r in rows:
        assert r.negative_label != r.qlabel
        assert labels[r.hard_negative_id] == r.negative_label
        assert r.hard_negative_id >= 15
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
