"""Wave-387 pytests: Crow-AMSAA + u-chart replayed in pure Python."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_crow_amsaa_matches_pure_python(spark):
    row = QUERIES["events_crow_amsaa"](spark, SF).first()
    micros = sorted(
        r["us"]
        for r in table(spark, SF, "events")
        .where(F.col("event_type") == "error")
        .select(F.unix_micros("ts").alias("us"))
        .collect()
    )
    taus = [(u - micros[0]) / 1e6 + 1.0 for u in micros]
    t = max(taus) + 3600.0
    s_micro = sum(math.floor(math.log(t / tau) * 1_000_000) for tau in taus)
    n = len(taus)
    assert row["n_failures"] == n
    assert row["s_micro"] == s_micro
    beta = n * 1e6 / s_micro
    assert abs(row["beta_hat"] - round(beta, 6)) <= 1e-9
    assert abs(row["lambda_hat"] - round(n / t**beta, 6)) <= 1e-9
    assert row["reliability_growth"] == (n * 1_000_000 < s_micro)
    # quantization sanity: micro-nat floor loses < 1e-6 per event vs the
    # unquantized MLE
    exact = n / sum(math.log(t / tau) for tau in taus)
    assert abs(beta - exact) < 1e-4


def test_u_chart_matches_pure_python(spark):
    rows = QUERIES["events_u_chart"](spark, SF).collect()
    daily = {}
    for r in (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("d"),
        )
        .collect()
    ):
        daily[r["day"].isoformat()] = (r["n"], r["d"])
    u_bar = sum(d for _n, d in daily.values()) / sum(n for n, _d in daily.values())
    assert len(rows) == len(daily)
    n_ooc = 0
    for r in rows:
        n, d = daily[r["day"]]
        assert r["n_units"] == n and r["n_defects"] == d
        ucl = u_bar + 3 * math.sqrt(u_bar / n)
        lcl = max(u_bar - 3 * math.sqrt(u_bar / n), 0.0)
        assert abs(r["ucl"] - round(ucl, 6)) <= 1e-9
        assert abs(r["lcl"] - round(lcl, 6)) <= 1e-9
        want_ooc = d / n > ucl or d / n < lcl
        assert r["out_of_control"] == want_ooc
        n_ooc += want_ooc
    # the chart is calibrated: most days must be in control
    assert n_ooc <= len(rows) // 2
