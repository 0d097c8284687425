"""Wave-156: SAX reference; Huber robustness vs mean/median."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_sax_matches_python(spark):
    rows = {r["segment"]: r for r in QUERIES["events_sax_representation"](spark, SF).collect()}
    daily = sorted(
        (r["day"], r["x"])
        for r in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    xs = [x for _, x in daily]
    n = len(xs)
    mu = sum(xs) / n
    sd = (sum(v * v for v in xs) / n - mu * mu) ** 0.5
    segs = defaultdict(list)
    for i, x in enumerate(xs):
        segs[i * 6 // n].append(x)
    assert set(rows) == set(segs)
    for s_id, vals in segs.items():
        z = (sum(vals) / len(vals) - mu) / sd
        r = rows[s_id]
        assert r["seg_days"] == len(vals)
        assert abs(r["paa_z"] - z) < 1e-5
        expect = "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        assert r["symbol"] == expect


def test_huber_between_median_and_mean_and_robust(spark):
    rows = {r["event_type"]: r for r in QUERIES["agg_huber_m_estimator"](spark, SF).collect()}
    per = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .select("event_type", F.round(F.col("value") * 1000).cast("long").alias("x"))
        .collect()
    ):
        per[r["event_type"]].append(r["x"])
    for et, xs in per.items():
        r = rows[et]
        mean = sum(xs) / len(xs)
        lo, hi = min(r["median_milli"], mean), max(r["median_milli"], mean)
        # the M-estimate lands in the median..mean corridor (fixture data
        # is right-skewed so the corridor is nondegenerate)
        assert lo - abs(lo) * 0.01 - 1 <= r["huber_step2_milli"] <= hi + abs(hi) * 0.01 + 1
        assert r["mad_milli"] >= 0
