"""Wave-90 semantic checks."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_erlang_c_monotone_and_matches_formula(spark):
    rows = QUERIES["events_erlang_c_staffing"](spark, SF_SMALL).collect()
    assert [r.c for r in rows] == list(range(1, 11))
    a = rows[0].offered_load
    assert a > 0
    # waiting probability decreases as agents are added
    pw = [r.p_wait for r in rows]
    assert all(pw[i] >= pw[i + 1] - 1e-9 for i in range(len(pw) - 1))
    # closed-form check for each unsaturated c
    for r in rows:
        if a >= r.c:
            assert r.p_wait == 1.0
            continue
        s = sum(a ** k / math.factorial(k) for k in range(r.c))
        tc = a ** r.c / math.factorial(r.c)
        expect = (tc * r.c / (r.c - a)) / (s + tc * r.c / (r.c - a))
        assert abs(r.p_wait - expect) < 1e-5
        assert r.meets_sla == (r.p_wait < 0.2)


def test_youden_threshold_is_argmax(spark):
    r = QUERIES["model_youden_threshold"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select(
            F.round(F.col("l_discount") * 100).cast("long").alias("s"),
            (F.col("l_returnflag") == "R").cast("int").alias("y"),
        )
        .toPandas()
    )
    P = pdf["y"].sum()
    N = len(pdf) - P
    best_j, best_t = -2.0, None
    for t in sorted(pdf["s"].unique()):
        tp = pdf[(pdf.s >= t)]["y"].sum()
        fp = (pdf.s >= t).sum() - tp
        j = tp / P - fp / N
        if j > best_j + 1e-12:
            best_j, best_t = j, t
    assert r.threshold == best_t
    assert abs(r.youden_j - best_j) < 1e-5
    assert abs(r.youden_j - (r.tpr - r.fpr)) < 2e-6


def test_capture_recapture_reasonable(spark):
    r = QUERIES["events_capture_recapture"](spark, SF_SMALL).first()
    assert r.m > 0
    assert r.m <= min(r.n1, r.n2)
    # Chapman <= Lincoln-Petersen, both >= observed union size
    assert r.chapman <= r.lincoln_petersen + 1e-9
    union = r.n1 + r.n2 - r.m
    assert r.lincoln_petersen >= union - 1e-9
    # with near-complete weekly coverage the estimate lands near truth
    assert r.lincoln_petersen <= 10 * r.n_true
