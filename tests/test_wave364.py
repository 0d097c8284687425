"""Wave-364/365 semantics: Fligner-Killeen invariances, EMSR-b nesting,
DDM thresholds, binary-segmentation optimality."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_fligner_killeen_shape(spark):
    row = QUERIES["agg_fligner_killeen"](spark, SF).first()
    assert row["k_groups"] == 3 and row["df"] == 2
    # chi2 is a normalized sum of squares — nonnegative, and bounded by
    # (N-1) (all between-group variance)
    assert 0.0 <= row["fk_chi2"] <= row["n_total"] - 1
    n = (
        table(spark, SF, "events")
        .where(F.col("event_type").isin("purchase", "click", "view"))
        .count()
    )
    assert row["n_total"] == n


def test_emsr_b_nesting(spark):
    rows = {r["j"]: r for r in QUERIES["opt_emsr_b"](spark, SF).collect()}
    assert set(rows) == {1, 2, 3}
    for j, r in rows.items():
        # f̄_j is a demand-weighted mean of the top-j fares, so it is at
        # least the next class's fare (classes are fare-ordered)
        assert r["fare_bar"] >= r["fare_next"] - 1e-6
        assert 0.0 < r["critical_ratio"] <= 1.0 + 1e-9
        assert r["protection_level"] >= 0
    # nested protection levels are monotone: protecting classes 1..j+1
    # covers more aggregate demand than 1..j
    assert rows[1]["protection_level"] <= rows[2]["protection_level"]
    assert rows[2]["protection_level"] <= rows[3]["protection_level"]


def test_ddm_levels_vs_python(spark):
    rows = QUERIES["model_ddm_drift"](spark, SF).collect()
    daily = sorted(
        (r["day"], r["n"], r["e"])
        for r in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("e"),
        )
        .collect()
    )
    import math

    cn = ce = 0
    mn = None
    expect = {}
    for day, n, e in daily:
        cn += n
        ce += e
        p = ce / cn
        s = math.sqrt(p * (1 - p) / cn)
        p_nano, s_nano = math.floor(1e9 * p), math.floor(1e9 * s)
        key = (p_nano + s_nano) * 10**10 + s_nano
        mn = key if mn is None else min(mn, key)
        pmin_s, smin = divmod(mn, 10**10)
        ps = p_nano + s_nano
        lvl = (
            "drift"
            if ps >= pmin_s + 3 * smin
            else ("warning" if ps >= pmin_s + 2 * smin else "ok")
        )
        expect[day.strftime("%Y-%m-%d")] = (cn, ce, lvl)
    assert len(rows) == len(expect)
    for r in rows:
        cn, ce, lvl = expect[r["day"]]
        assert (r["n_seen"], r["n_errors"], r["level"]) == (cn, ce, lvl)


def test_binary_segmentation_first_split_is_optimal(spark):
    daily = sorted(
        (r["d"], r["y"])
        for r in table(spark, SF, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"))
        .collect()
    )
    ys = [y for _, y in daily]
    n = len(ys)

    def sse(seg):
        m = sum(seg) / len(seg)
        return sum((v - m) ** 2 for v in seg)

    # exhaustive best first split by SSE (equivalent to the gain form)
    best_k = min(range(1, n), key=lambda k: (sse(ys[:k]) + sse(ys[k:]), k))
    rows = sorted(
        QUERIES["events_binary_segmentation"](spark, SF).collect(),
        key=lambda r: r["segment"],
    )
    # segments 0,1 cover the left part (size best_k), 2,3 the right
    left = sum(r["n_days"] for r in rows if r["segment"] < 2)
    assert left == best_k
    assert sum(r["n_days"] for r in rows) == n
    # segment means match python on the reconstructed boundaries
    pos = 0
    for r in rows:
        seg = ys[pos : pos + r["n_days"]]
        pos += r["n_days"]
        assert abs(r["seg_mean"] - sum(seg) / len(seg)) < 1e-6
