"""Wave-149: Chao1/Good-Turing reference; Taylor law OLS reference."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_chao1_good_turing_matches_python(spark):
    r = QUERIES["text_chao1_good_turing"](spark, SF).collect()[0]
    counts = Counter()
    for d in table(spark, SF, "documents").collect():
        counts.update(d["text"].split(" "))
    fof = Counter(counts.values())
    obs = sum(fof.values())
    n = sum(c * k for c, k in ((c, fof[c]) for c in fof))
    f1, f2 = fof.get(1, 0), fof.get(2, 0)
    chao1 = obs + f1 * f1 / (2 * (f2 + 1)) - f1 * f2 / (2 * (f2 + 1) ** 2)
    assert (r["observed"], r["n_tokens"], r["f1"], r["f2"]) == (obs, n, f1, f2)
    assert abs(r["chao1_bias_corrected"] - chao1) < 1e-3
    assert abs(r["gt_unseen_mass"] - f1 / n) < 1e-6
    assert r["chao1_bias_corrected"] >= obs  # richness >= observed


def test_taylor_law_matches_python(spark):
    r = QUERIES["agg_taylor_power_law"](spark, SF).collect()[0]
    per = defaultdict(list)
    for row in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        per[row["event_type"]].append(row["x"])
    pts = []
    for xs in per.values():
        n = len(xs)
        m = sum(xs) / n
        v = (sum(x * x for x in xs) - sum(xs) ** 2 / n) / (n - 1)
        pts.append((math.log(m), math.log(v)))
    k = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    b = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert r["k"] == k
    assert abs(r["taylor_b"] - b) < 1e-4
    assert abs(r["taylor_ln_a"] - (sy - b * sx) / k) < 1e-4
