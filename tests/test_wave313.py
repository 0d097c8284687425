"""Wave-313: RQA vs a python recurrence-matrix replay; Poincaré SD1/SD2
vs direct rotation plus the ACF duality identity."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _series(spark):
    days = Counter(
        r["d"]
        for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    )
    return [days[d] for d in sorted(days)]


def test_rqa_matches_matrix_replay(spark):
    row = QUERIES["events_recurrence_quantification"](spark, SF).first()
    xs = _series(spark)
    n = len(xs)
    mu = sum(xs) / n
    eps = 0.2 * math.sqrt(sum(x * x for x in xs) / n - mu * mu)
    rec = {
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and abs(xs[i] - xs[j]) < eps
    }
    n_diag = sum(
        1 for (i, j) in rec if (i + 1, j + 1) in rec or (i - 1, j - 1) in rec
    )
    assert row["n_days"] == n
    assert abs(row["epsilon"] - eps) < 1e-4
    assert row["n_recurrent_pairs"] == len(rec)
    assert abs(row["recurrence_rate"] - len(rec) / (n * (n - 1))) < 1e-6
    assert abs(row["determinism"] - n_diag / len(rec)) < 1e-6
    assert 0 <= row["recurrence_rate"] <= 1
    assert 0 <= row["determinism"] <= 1


def test_poincare_matches_rotation_and_acf_duality(spark):
    row = QUERIES["events_poincare_sd"](spark, SF).first()
    xs = _series(spark)
    pairs = list(zip(xs, xs[1:]))
    d1 = [(b - a) / math.sqrt(2) for a, b in pairs]
    d2 = [(b + a) / math.sqrt(2) for a, b in pairs]

    def varp(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / len(v)

    sd1, sd2 = math.sqrt(varp(d1)), math.sqrt(varp(d2))
    assert row["n_pairs"] == len(pairs)
    assert abs(row["sd1"] - sd1) < 1e-4
    assert abs(row["sd2"] - sd2) < 1e-4
    assert abs(row["sd1_sd2_ratio"] - sd1 / sd2) < 1e-5
    assert abs(row["ellipse_area"] - math.pi * sd1 * sd2) < 0.02
    # Brennan duality: SD1^2/SD2^2 ~= (1 - r1)/(1 + r1) with r1 the lag-1
    # autocorrelation of the PAIRED margins (exact when the two margins
    # share mean and variance; a drifting series only matches loosely)
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    cov = sum((x - ma) * (y - mb) for x, y in pairs) / len(pairs)
    r1 = cov / math.sqrt(varp(a) * varp(b))
    lhs = (sd1 / sd2) ** 2
    rhs = (1 - r1) / (1 + r1)
    assert abs(lhs - rhs) < 0.1
