"""Semantic invariants for the wave-6 additions (admission control,
mapInArrow, interval-bucket join, lake maintenance). Oracle hash-parity is
covered by tools/check_oracle.py; these re-derive results through
independent third paths and assert the layout/pruning payoffs a value hash
can't see.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_MED


def test_rate_limit_matches_python_fold_and_sheds(spark):
    got = {
        (r.user_id, r.event_id): (r.admitted, r.tokens_after)
        for r in QUERIES["events_rate_limit"](spark, SF_MED).collect()
    }
    events = sorted(
        table(spark, SF_MED, "events")
        .select("user_id", "ts", "event_id", F.unix_millis("ts").alias("ms"))
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    state: dict[int, tuple[int, int]] = {}  # user -> (tokens, last_ms)
    shed = 0
    for r in events:
        tokens, last = state.get(r.user_id, (2000, None))
        if last is not None:
            tokens = min(2000, tokens + (r.ms - last) // 7200)
        ok = tokens >= 1000
        if ok:
            tokens -= 1000
        else:
            shed += 1
        state[r.user_id] = (tokens, r.ms)
        assert got[(r.user_id, r.event_id)] == (ok, tokens), (r.user_id, r.event_id)
    assert shed > 0, "fixture never saturates the bucket — parameters too loose"


def test_map_in_arrow_matches_jvm_hof(spark, sf_small):
    """Independent third path: the same quantized norm via JVM-side
    higher-order functions (no Python, no Arrow)."""
    got = {
        r.vec_id: (r.dim, r.norm_sq_micro)
        for r in QUERIES["udf_map_in_arrow"](spark, sf_small).collect()
    }
    jvm = (
        table(spark, sf_small, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.aggregate(
                F.transform(
                    "embedding",
                    lambda x: (
                        F.floor(x.cast("double") * 1000).cast("long")
                        * F.floor(x.cast("double") * 1000).cast("long")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("nsm"),
        )
        .collect()
    )
    assert got == {r.vec_id: (r.dim, r.nsm) for r in jvm}


def test_interval_bucket_is_lossless_vs_naive_range_join(spark, sf_small):
    got = {
        (r.orderkey, r.n_lines, r.sum_qty)
        for r in QUERIES["join_interval_bucket"](spark, sf_small).collect()
    }
    o = (
        table(spark, sf_small, "orders")
        .where("o_orderpriority = '1-URGENT'")
        .select("o_orderkey", "o_orderdate").collect()
    )
    li = table(spark, sf_small, "lineitem").select("l_shipdate", "l_quantity").collect()
    import datetime

    naive: dict[int, tuple[int, int]] = {}
    for ord_ in o:
        lo = ord_.o_orderdate
        hi = lo + datetime.timedelta(days=7)
        n = q = 0
        for l in li:
            if lo <= l.l_shipdate < hi:
                n += 1
                q += int(l.l_quantity)
        if n:
            naive[ord_.o_orderkey] = (n, q)
    assert got == {(k, n, q) for k, (n, q) in naive.items()}


def test_interval_bucket_plan_has_no_nested_loop(spark, sf_small):
    from tests.test_scale_plans import plan

    p = plan(spark, "join_interval_bucket", sf_small).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashJoin" in p  # candidate equi-join on the time bin


def test_compaction_reduces_files_losslessly(spark, sf_small):
    rows = {r.phase: r for r in QUERIES["maintenance_compact_small_files"](spark, sf_small).collect()}
    assert rows["fragmented"].n_files == 64
    assert rows["compacted"].n_files == 4
    assert rows["fragmented"].n_rows == rows["compacted"].n_rows
    assert rows["fragmented"].key_sum == rows["compacted"].key_sum


def test_range_clustering_confines_time_window_to_few_files(spark, sf_small):
    """The payoff assertion: a month of data lives in ≤2 of 8 clustered
    files but is smeared across ~all scattered files."""
    import os
    import tempfile

    o = table(spark, sf_small, "orders").select("o_orderkey", "o_orderdate")
    root = tempfile.mkdtemp(prefix="cluster_probe_")
    clus, scat = os.path.join(root, "c"), os.path.join(root, "s")
    (o.repartitionByRange(8, "o_orderdate").sortWithinPartitions("o_orderdate")
     .write.mode("overwrite").parquet(clus))
    o.repartition(8, "o_orderkey").write.mode("overwrite").parquet(scat)
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1995-02-01").cast("timestamp")

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .select(F.col("_metadata.file_name")).distinct().count()
        )

    assert files_touched(clus) <= 2
    assert files_touched(scat) >= 6
