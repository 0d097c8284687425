"""Wave-129 semantics: energy-distance identities, Levene reference,
Friedman reference — all against pure-python recomputation."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    return sorted(
        (r["day"], r["x"])
        for r in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )


def test_energy_distance_matches_python(spark):
    row = QUERIES["agg_energy_distance"](spark, SF).collect()[0]
    xs = [x for _, x in _daily(spark)]
    half = len(xs) // 2
    a, b = xs[:half], xs[half:]
    s_ab = sum(abs(p - q) for p in a for q in b)
    s_aa = sum(abs(p - q) for p in a for q in a)
    s_bb = sum(abs(p - q) for p in b for q in b)
    assert (row["s_ab"], row["s_aa"], row["s_bb"]) == (s_ab, s_aa, s_bb)
    e = 2 * s_ab / (len(a) * len(b)) - s_aa / len(a) ** 2 - s_bb / len(b) ** 2
    assert abs(row["energy_dist"] - e) < 1e-5
    assert row["energy_dist"] >= 0  # energy distance is nonnegative


def test_levene_matches_python(spark):
    row = QUERIES["agg_levene_brown_forsythe"](spark, SF).collect()[0]
    per = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        per[r["event_type"]].append((r["day"], r["x"]))
    zs = {}
    for t, vals in per.items():
        xs = [x for _, x in sorted(vals, key=lambda p: (p[1], p[0]))]
        med = xs[(len(xs) + 1) // 2 - 1]
        zs[t] = [abs(x - med) for x in xs]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    gmean = sum(sum(v) for v in zs.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gmean) ** 2 for v in zs.values())
    ssw = sum(sum((z - sum(v) / len(v)) ** 2 for z in v) for v in zs.values())
    w = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row["n"], row["k"]) == (n, k)
    assert abs(row["w_stat"] - w) < 1e-4


def test_friedman_matches_python(spark):
    row = QUERIES["agg_friedman_test"](spark, SF).collect()[0]
    cells = defaultdict(dict)
    raw = (
        table(spark, SF, "events")
        .groupBy("event_type", F.weekofyear(F.col("ts").cast("date")).alias("wk"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    types = {r["event_type"] for r in raw}
    weeks = {r["wk"] for r in raw}
    for r in raw:
        cells[r["wk"]][r["event_type"]] = r["x"]
    b, k = len(weeks), len(types)
    assert (row["b"], row["k"]) == (b, k)
    rsum2 = defaultdict(int)
    ssr4 = 0
    for wk in weeks:
        vals = [(cells[wk].get(t, 0), t) for t in types]
        xs = sorted(v for v, _ in vals)
        for v, t in vals:
            r2 = 2 * sum(1 for p in xs if p < v) + sum(1 for p in xs if p == v) + 1
            rsum2[t] += r2
            ssr4 += r2 * r2
    num = sum((rsum2[t] - b * (k + 1)) ** 2 for t in types) / (4.0 * b)
    den = (ssr4 - b * k * (k + 1) ** 2) / 4.0
    q = (k - 1) * num / den
    assert abs(row["q_stat"] - q) < 1e-4
