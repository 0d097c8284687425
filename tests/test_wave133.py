"""Wave-133: effect-size identities, divergence bounds, V-optimal DP vs
brute force."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_effect_sizes_relationships(spark):
    r = QUERIES["agg_effect_sizes"](spark, SF).collect()[0]
    # Hedges g is a shrunk Cohen's d (same sign, smaller magnitude)
    assert abs(r["hedges_g"]) < abs(r["cohens_d"]) or r["cohens_d"] == 0
    assert (r["hedges_g"] >= 0) == (r["cohens_d"] >= 0)


def test_divergence_bounds_and_ordering(spark):
    r = QUERIES["agg_divergence_family"](spark, SF).collect()[0]
    assert 0 <= r["js_divergence"] <= 0.6932  # ln 2 bound
    assert 0 <= r["hellinger"] <= 1.0
    assert 0 <= r["total_variation"] <= 1.0
    # Hellinger^2 <= TV <= sqrt(2) * Hellinger (standard inequalities)
    assert r["hellinger"] ** 2 <= r["total_variation"] + 1e-9
    assert r["total_variation"] <= 2 ** 0.5 * r["hellinger"] + 1e-9


def test_voptimal_matches_bruteforce(spark):
    r = QUERIES["events_voptimal_histogram"](spark, SF).collect()[0]
    daily = sorted(
        (row["day"], row["x"])
        for row in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    xs = [x for _, x in daily]
    d = len(xs)

    def sse(a, b):  # slice (a..b], 1-based day indices
        seg = xs[a:b]
        n = len(seg)
        s, q = sum(seg), sum(v * v for v in seg)
        return q - (s * s) / n

    best = None
    for c1, c2, c3 in itertools.combinations(range(1, d), 3):
        cost = sse(0, c1) + sse(c1, c2) + sse(c2, c3) + sse(c3, d)
        key = (cost, c1, c2, c3)
        if best is None or key < best:
            best = key
    assert (r["cut1"], r["cut2"], r["cut3"]) == (best[1], best[2], best[3])
    assert abs(r["total_sse"] - best[0]) < 1e-3
