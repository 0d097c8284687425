"""Wave-134: GPD fit reference, Hampel reference, trimmed-mean
robustness."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark, by_type=False):
    g = ["event_type"] if by_type else []
    return (
        table(spark, SF, "events")
        .groupBy(*g, F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )


def test_gpd_fit_matches_python(spark):
    row = QUERIES["events_pot_gpd_fit"](spark, SF).collect()[0]
    xs = sorted((r["day"], r["x"]) for r in _daily(spark))
    vals = sorted((x, d) for d, x in xs)
    d = len(vals)
    u = vals[math.ceil(0.75 * d) - 1][0]
    exc = [x - u for x, _ in vals if x > u]
    k = len(exc)
    m = sum(exc) / k
    var = (sum(y * y for y in exc) - sum(exc) ** 2 / k) / (k - 1)
    assert row["threshold"] == u and row["n_exceed"] == k
    assert abs(row["mean_excess"] - m) < 1e-5
    assert abs(row["xi_hat"] - 0.5 * (1 - m * m / var)) < 1e-5
    assert abs(row["beta_hat"] - 0.5 * m * (m * m / var + 1)) < 1e-5


def test_hampel_matches_python(spark):
    rows = {
        (r["event_type"], r["day"]): r
        for r in QUERIES["events_hampel_filter"](spark, SF).collect()
    }
    per = defaultdict(list)
    for r in _daily(spark, by_type=True):
        per[r["event_type"]].append((r["day"], r["x"]))
    for et, days in per.items():
        days.sort()
        xs = [x for _, x in days]
        for i, (day, x) in enumerate(days):
            w = xs[max(0, i - 3) : i + 4]
            med = sorted(w)[(len(w) + 1) // 2 - 1]
            mad = sorted(abs(v - med) for v in w)[(len(w) + 1) // 2 - 1]
            r = rows[(et, day.strftime("%Y-%m-%d"))]
            assert (r["med"], r["mad"]) == (med, mad)
            assert r["is_outlier"] == (abs(x - med) > 3 * mad)


def test_trimmed_mean_matches_python(spark):
    rows = {r["event_type"]: r for r in QUERIES["agg_trimmed_mean"](spark, SF).collect()}
    per = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .select("event_type", F.round(F.col("value") * 1000).cast("long").alias("x"), "event_id")
        .collect()
    ):
        per[r["event_type"]].append((r["x"], r["event_id"]))
    for et, vals in per.items():
        vals.sort()
        xs = [x for x, _ in vals]
        n = len(xs)
        k = n // 10
        kept = xs[k : n - k]
        r = rows[et]
        assert r["n"] == n and r["n_kept"] == len(kept)
        assert abs(r["trimmed_mean"] - sum(kept) / len(kept) / 1000) < 1e-5
        assert abs(r["plain_mean"] - sum(xs) / n / 1000) < 1e-5
        # the fixture's right-skewed values pull the plain mean above the
        # trimmed one
        assert r["trimmed_mean"] < r["plain_mean"]
