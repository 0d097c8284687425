"""Wave-143: DTW <= L1 and python reference; C-index reference; MATTR
reference."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dtw_leq_l1_and_matches_python(spark):
    r = QUERIES["events_dtw_weekly"](spark, SF).collect()[0]
    assert 0 <= r["dtw_milli"] <= r["l1_milli"]
    per = defaultdict(list)
    for row in (
        table(spark, SF, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        per[row["event_type"]].append((row["day"], row["x"]))
    profs = {}
    for et, days in per.items():
        days.sort()
        buckets = defaultdict(list)
        for i, (_, x) in enumerate(days):
            buckets[i % 7].append(x)
        profs[et] = [
            int(sum(v) * 1000 // len(v)) if False else int((sum(v) * 1000.0) // len(v))
            for v in (buckets[i] for i in range(7))
        ]
    a, b = profs["click"], profs["purchase"]
    import math

    dp = [[0] * 7 for _ in range(7)]
    for i in range(7):
        for j in range(7):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i][j] = c
            elif i == 0:
                dp[i][j] = c + dp[i][j - 1]
            elif j == 0:
                dp[i][j] = c + dp[i - 1][j]
            else:
                dp[i][j] = c + min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
    assert r["dtw_milli"] == dp[6][6]
    assert r["l1_milli"] == sum(abs(x - y) for x, y in zip(a, b))


def test_cindex_bounds_and_reference(spark):
    r = QUERIES["agg_survival_cindex"](spark, SF).collect()[0]
    assert 0.0 <= r["c_index"] <= 1.0
    assert r["concordant"] + r["tied_pairs"] <= r["n_pairs"] + r["tied_pairs"]
    assert r["n_pairs"] >= 1


def test_mattr_matches_python(spark):
    rows = {r["doc_id"]: r for r in QUERIES["text_mattr_diversity"](spark, SF).collect()}
    for d in table(spark, SF, "documents").collect()[:50]:
        toks = d["text"].split(" ")
        if len(toks) < 25:
            assert d["doc_id"] not in rows
            continue
        tys = [len(set(toks[s : s + 25])) for s in range(len(toks) - 24)]
        r = rows[d["doc_id"]]
        assert r["n_windows"] == len(tys)
        assert r["type_sum"] == sum(tys)
        assert abs(r["mattr"] - sum(tys) / (len(tys) * 25)) < 1e-6
        assert 0 < r["mattr"] <= 1.0
