"""Wave-380 independent replays: isotonic fit via the classic PAVA
pooling algorithm on exact rationals (independent of the minimax-
formula evaluation); seasonal decomposition by a plain-python walk."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
Q = 1_000_000


def _pava(points):
    """Classic pool-adjacent-violators on (sum, count) pairs -> exact
    rational fitted means per index."""
    blocks = [[s, c, 1] for s, c in points]  # sum, weight(count), span
    i = 0
    while i < len(blocks) - 1:
        a, b = blocks[i], blocks[i + 1]
        if Fraction(a[0], a[1]) > Fraction(b[0], b[1]):
            blocks[i] = [a[0] + b[0], a[1] + b[1], a[2] + b[2]]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fit = []
    for s, c, span in blocks:
        fit.extend([Fraction(s, c)] * span)
    return fit


def test_isotonic_minimax_matches_pava_pooling(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy(F.hour("ts").alias("h"))
        .agg(
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("s"),
            F.count("*").alias("c"),
        )
        .orderBy("h")
        .collect()
    )
    points = [(int(r["s"]), int(r["c"])) for r in rows]
    fit = _pava(points)
    got = {r["hour"]: r for r in QUERIES["model_isotonic_pava"](spark, SF).collect()}
    assert len(got) == len(points)
    prev = None
    for idx, r in enumerate(rows):
        row = got[r["h"]]
        # quantized minimax sits within one micro-unit of the exact
        # rational PAVA mean (floor quantization per segment)
        exact_micro = fit[idx] * Q
        assert abs(row["fit_micro"] - float(exact_micro)) <= 1.0 + 1e-9
        if prev is not None:
            assert row["fit_micro"] >= prev  # isotonic
        prev = row["fit_micro"]
        assert row["n"] == points[idx][1]


def test_seasonal_decompose_python_walk(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy(
            F.col("ts").cast("date").alias("day"), F.weekday("ts").alias("dow")
        )
        .agg(F.count("*").alias("c"))
        .orderBy("day")
        .collect()
    )
    days = [(r["day"], int(r["dow"]), int(r["c"])) for r in rows]
    interior = []
    for i in range(3, len(days) - 3):
        t7 = sum(days[j][2] for j in range(i - 3, i + 4))
        interior.append((days[i][0], days[i][1], days[i][2], t7, 7 * days[i][2] - t7))
    seas = {}
    for dow in set(d[1] for d in interior):
        det = [d[4] for d in interior if d[1] == dow]
        num = Q * sum(det)
        den = 7 * len(det)
        # both engines' integer division truncates toward zero
        q = abs(num) // den
        seas[dow] = q if num >= 0 else -q
    got = {r["day"]: r for r in QUERIES["events_seasonal_decompose"](spark, SF).collect()}
    assert len(got) == len(interior)
    for day, dow, c, t7, d7 in interior:
        row = got[day.isoformat()]
        assert row["raw"] == c
        assert row["trend_x7"] == t7
        assert row["detrended_x7"] == d7
        assert row["seasonal_micro"] == seas[dow]
        assert row["trend"] == round(t7 / 7, 4)
        assert row["remainder"] == round(c - t7 / 7 - seas[dow] / Q, 4)
    # additive identity (exact up to per-dow floor error < 1 micro-unit
    # times the group denominator): sum over dows of seasonal * 7 * n_dow
    # equals Q * total detrended mass
    lhs = sum(
        seas[dow] * 7 * sum(1 for d in interior if d[1] == dow)
        for dow in seas
    )
    rhs = Q * sum(d[4] for d in interior)
    max_floor_err = sum(7 * sum(1 for d in interior if d[1] == dow) for dow in seas)
    assert abs(lhs - rhs) <= max_floor_err
