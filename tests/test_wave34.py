"""Wave-34 semantic checks."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_interval_overlap_matches_bruteforce(spark):
    rows = {(r.a_key, r.b_key): r.overlap_days
            for r in QUERIES["join_interval_overlap"](spark, SF_SMALL).collect()}
    o = table(spark, SF_SMALL, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    ).collect()
    a = [(r.o_orderkey, r.d.toordinal(), r.d.toordinal() + r.o_orderkey % 5 + 1)
         for r in o if r.o_orderkey % 97 == 0]
    b = [(r.o_orderkey, r.d.toordinal(), r.d.toordinal() + r.o_orderkey % 11 + 1)
         for r in o if r.o_orderkey % 89 == 0]
    want = {}
    for ak, as_, ae in a:
        for bk, bs, be in b:
            if ak != bk and as_ <= be and bs <= ae:
                want[(ak, bk)] = min(ae, be) - max(as_, bs)
    assert rows == want


def test_holt_exactly_replays_pure_python(spark):
    """alpha=beta=0.5 recurrence must be bit-exact vs a python replay."""
    row = QUERIES["events_holt_smoothing"](spark, SF_SMALL).first()
    series = sorted(
        (r.d, float(r.x))
        for r in table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").cast("double").alias("x"))
        .collect()
    )
    xs = [x for _, x in series]
    s, b = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        s_new = 0.5 * x + 0.5 * (s + b)
        b = 0.5 * (s_new - s) + 0.5 * b
        s = s_new
    assert row.n_days == len(xs)
    assert row.level == s  # bit-exact: dyadic rationals, no rounding
    assert row.trend == b
    assert row.forecast_next == s + b


def test_decayed_engagement_monotone_in_recency(spark):
    rows = QUERIES["events_decayed_engagement"](spark, SF_SMALL).collect()
    assert all(r.decayed_score >= 0 or math.isclose(r.decayed_score, 0) for r in rows)
    e = table(spark, SF_SMALL, "events")
    n_users = e.select("user_id").distinct().count()
    assert len(rows) == n_users
    # decayed score can never exceed the undecayed value sum
    plain = {r.user_id: r.s for r in e.groupBy("user_id").agg(F.sum("value").alias("s")).collect()}
    for r in rows:
        assert r.decayed_score <= plain[r.user_id] + 1e-6
