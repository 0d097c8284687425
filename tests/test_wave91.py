"""Wave-91 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_kaplan_meier_matches_sequential(spark):
    rows = QUERIES["events_kaplan_meier"](spark, SF_SMALL).collect()
    assert [r.k for r in rows] == list(range(1, 11))
    s = [r.km_survival for r in rows]
    assert s == sorted(s, reverse=True)
    assert all(0 <= v <= 1 for v in s)
    # replay the textbook sequential product from the reported d/r
    surv = 1.0
    for r in rows:
        if r.at_risk > 0:
            surv *= 1 - r.churned / r.at_risk
        assert abs(r.km_survival - surv) < 1e-5
    # at-risk is non-increasing over time
    at_risk = [r.at_risk for r in rows]
    assert at_risk == sorted(at_risk, reverse=True)


def test_ewma_chart_tracks_series(spark):
    rows = QUERIES["events_ewma_control_chart"](spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r.day)
    # replay the truncated normalized EWMA
    xs = [r.x for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - 29)
        num = sum(xs[j] * 0.5 ** (i - j + 1) for j in range(lo, i + 1))
        den = sum(0.5 ** (i - j + 1) for j in range(lo, i + 1))
        assert abs(r.ewma - num / den) < 1e-3
        assert r.lcl < r.ucl
        assert r.alarm == (r.ewma > r.ucl or r.ewma < r.lcl) or (
            abs(r.ewma - r.ucl) < 1e-3 or abs(r.ewma - r.lcl) < 1e-3
        )
    # first EWMA equals the first observation
    assert abs(rows[0].ewma - xs[0]) < 1e-6


def test_propensity_pairs_are_balanced_strata(spark):
    rows = QUERIES["events_propensity_match_pairs"](spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.n_pairs >= 1
        # matched controls come from the same activity stratum, so the
        # bucket width bounds the mean activity gap
        assert abs(r.avg_events_treated - r.avg_events_control) <= 20 + 1e-9
