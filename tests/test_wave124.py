"""Wave-124 semantics: matrix-profile symmetry/motifs, k-core fixpoint,
space-saving guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_matrix_profile_nn_is_true_min(spark):
    rows = {r["win_idx"]: r for r in QUERIES["events_matrix_profile_ssd"](spark, SF).collect()}
    assert rows
    # rebuild windows in python and verify each profile value exactly
    daily = sorted(
        (r["day"], r["x"])
        for r in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    xs = [x for _, x in daily]
    wins = [xs[i : i + 7] for i in range(len(xs) - 6)]
    for i, r in rows.items():
        cands = [
            (sum((a - b) ** 2 for a, b in zip(wins[i - 1], wins[j])), j + 1)
            for j in range(len(wins))
            if abs((i - 1) - j) > 3
        ]
        best = min(cands)
        assert r["profile_ssd"] == best[0]
        assert r["nn_idx"] == best[1]


def test_kcore_reaches_fixpoint_and_min_degree(spark):
    core = {r["part_id"]: r["core_degree"] for r in QUERIES["graph_kcore_peel"](spark, SF).collect()}
    if not core:
        return  # sf0.001 graph may peel to empty; structure checked at sf0.01
    # every surviving node keeps degree >= k within the surviving set
    assert min(core.values()) >= 3


def test_space_saving_bounds_vs_exact(spark):
    rows = QUERIES["stream_space_saving_topk"](spark, SF).collect()
    assert rows
    exact = {
        (r["shard"], r["user_id"]): r["c"]
        for r in table(spark, SF, "events")
        .select(F.pmod(F.col("user_id"), F.lit(8)).alias("shard"), "user_id")
        .groupBy("shard", "user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    shard_tot = {}
    for (s, _u), c in exact.items():
        shard_tot[s] = shard_tot.get(s, 0) + c
    monitored = {(r["shard"], r["user_id"]) for r in rows}
    for r in rows:
        true = exact[(r["shard"], r["user_id"])]
        # space-saving guarantee: est >= true >= est - err
        assert r["est_count"] >= true >= r["est_count"] - r["err_bound"]
        assert r["shard_events"] == shard_tot[r["shard"]]
    # any user with true count > N_shard/capacity must be monitored
    for (s, u), c in exact.items():
        if c > shard_tot[s] / 32:
            assert (s, u) in monitored
