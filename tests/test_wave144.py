"""Wave-144: voting/ranking invariants and references."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _ranks(spark):
    m = {
        r["event_type"]: (r["n"], r["v"], r["u"])
        for r in (
            table(spark, SF, "events")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 1000).cast("long")).alias("v"),
                F.count_distinct("user_id").alias("u"),
            )
            .collect()
        )
    }
    types = sorted(m)

    def rank_by(i):
        order = sorted(types, key=lambda t: (-m[t][i], t))
        return {t: order.index(t) + 1 for t in types}

    return rank_by(0), rank_by(1), rank_by(2), types


def test_borda_condorcet_matches_python(spark):
    r1, r2, r3, types = _ranks(spark)
    k = len(types)
    rows = {r["event_type"]: r for r in QUERIES["model_rank_borda_condorcet"](spark, SF).collect()}
    for t in types:
        assert rows[t]["borda_score"] == (k - r1[t]) + (k - r2[t]) + (k - r3[t])
        wins = sum(
            1
            for o in types
            if o != t
            and sum([r1[t] < r1[o], r2[t] < r2[o], r3[t] < r3[o]]) >= 2
        )
        assert rows[t]["pairwise_wins"] == wins
        assert rows[t]["condorcet_winner"] == (wins == k - 1)
    assert sum(1 for t in types if rows[t]["condorcet_winner"]) <= 1


def test_rbo_matches_python_and_bounds(spark):
    r1, r2, _r3, types = _ranks(spark)
    row = QUERIES["model_rbo_rank_similarity"](spark, SF).collect()[0]
    total = 0
    for d in range(1, 6):
        agree = sum(1 for t in types if r1[t] <= d and r2[t] <= d)
        total += round(1e9 * (1 - 0.9) * 0.9 ** (d - 1) * (agree / d))
        if d == 5:
            assert row["overlap_at_5"] == agree
    assert row["rbo_nano_sum"] == total
    assert 0.0 <= row["rbo_trunc5"] <= 1.0


def test_rank_distances_match_python(spark):
    r1, r2, _r3, types = _ranks(spark)
    row = QUERIES["agg_rank_distances"](spark, SF).collect()[0]
    foot = sum(abs(r1[t] - r2[t]) for t in types)
    kend = sum(
        1
        for i, a in enumerate(types)
        for b in types[i + 1 :]
        if (r1[a] - r1[b]) * (r2[a] - r2[b]) < 0
    )
    assert row["footrule"] == foot
    assert row["kendall_dist"] == kend
    # Diaconis-Graham: K <= footrule <= 2K
    assert kend <= foot <= 2 * kend or (kend == 0 and foot == 0)
