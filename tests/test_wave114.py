"""Wave-114 semantic checks."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_prob_beats_consistent_with_z(spark):
    r = QUERIES["events_ab_prob_beats"](spark, SF_SMALL).first()
    assert 0 <= r.prob_treat_beats <= 1
    # Phi(z) via math.erf as the reference
    phi = 0.5 * (1 + math.erf(r.z_stat / math.sqrt(2)))
    assert abs(r.prob_treat_beats - phi) < 1e-4  # A&S 7.1.26 ~ 7.5e-8 accurate
    assert (r.prob_treat_beats > 0.5) == (r.z_stat > 0) or abs(r.z_stat) < 1e-9
    total_users = table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert r.n_control + r.n_treat == total_users


def test_collocations_support_and_order(spark):
    rows = QUERIES["text_collocations_pmi"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 15
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.n_occurrences >= 25
    # spot-check PMI of the winner
    top = rows[0]
    toks = []
    for t in table(spark, SF_SMALL, "documents").collect():
        toks.append([w for w in t.text.lower().split(" ") if w])
    n = sum(len(ts) for ts in toks)
    c1 = sum(ts.count(top.w1) for ts in toks)
    c2 = sum(ts.count(top.w2) for ts in toks)
    cb = sum(
        1
        for ts in toks
        for a, b in zip(ts, ts[1:])
        if a == top.w1 and b == top.w2
    )
    assert cb == top.n_occurrences
    expect = math.log(cb * n / (c1 * c2))
    assert abs(top.pmi - expect) < 1e-3


def test_load_duration_curve_monotone(spark):
    rows = QUERIES["events_load_duration_curve"](spark, SF_SMALL).collect()
    assert [r.pct for r in rows] == [1, 10, 50, 90, 99]
    loads = [r.load_value for r in rows]
    # higher duration percentage -> lower or equal load
    assert loads == sorted(loads, reverse=True)
    assert all(v >= 1 for v in loads)
