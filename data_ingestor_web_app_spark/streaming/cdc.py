"""Wave-26: streaming CDC upsert, driver-checked against the batch MERGE.

The strongest equivalence statement in the streaming surface: the SAME
changelog applied (a) incrementally — replayed as a file stream, one
micro-batch at a time, foreachBatch MERGE into a parquet snapshot (the
copy-on-write loop every lakehouse sink runs) — and (b) as upsert_scd1's
one-shot batch MERGE, must produce byte-identical tables. The oracle is
the batch SQL, so the driver's hash check certifies the incremental path
converges to batch semantics regardless of how the feed was chunked.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "stream_cdc_upsert",
    oracle="""
    WITH chg AS (
        SELECT o_orderkey AS key, 'U' AS op, 'X' AS new_status,
               o_totalprice + 1000.0 AS new_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, 'D', NULL, NULL
        FROM orders WHERE o_orderkey % 10 = 5
        UNION ALL
        SELECT o_orderkey + 1000000000, 'I', 'N', ROUND(o_totalprice, 2)
        FROM orders WHERE o_orderkey % 1000 = 7
    )
    SELECT COALESCE(c.key, b.o_orderkey) AS o_orderkey,
           COALESCE(c.new_status, b.o_orderstatus) AS o_orderstatus,
           ROUND(COALESCE(c.new_totalprice, b.o_totalprice), 2) AS o_totalprice
    FROM orders b
    FULL OUTER JOIN chg c ON c.key = b.o_orderkey
    WHERE COALESCE(c.op, '') <> 'D'
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: upsert_scd1's derived changelog is split into
    3 files, replayed as a file STREAM (maxFilesPerTrigger=1, availableNow),
    and each micro-batch MERGEs into a parquet snapshot via foreachBatch
    read-merge-overwrite. Returns the final snapshot; the oracle is the
    ONE-SHOT batch MERGE — hash equality proves incremental == batch.

    Correctness subtlety: the changelog's keys are disjoint per operation
    (update/delete/insert partition the key space), so per-key order
    across micro-batches cannot change the fixed point — the property
    that makes chunk-order-independent CDC apply legal. Scale shape: each
    micro-batch is one key-equi merge join; under a real table format the
    overwrite becomes a keyed copy-on-write rewrite with partition
    pruning bounding the rewrite set.

    Durability: each micro-batch writes a FRESH versioned snapshot
    directory and only then advances the current-version pointer — the
    copy-on-write discipline of every table format. Reading version v
    while writing v+1 means a lost executor can recompute from intact
    input; the previous pattern (cache + overwrite the directory being
    read) silently corrupted the snapshot if cached partitions were
    evicted mid-overwrite."""
    from data_ingestor_web_app_spark.operators.upsert import _changelog

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir("cdc_stream_")
    chg_dir = os.path.join(root, "changelog")
    current = {"dir": os.path.join(root, "snapshot_v0")}
    base.write.mode("overwrite").parquet(current["dir"])
    chg = _changelog(base).withColumn("part", F.pmod("key", F.lit(3)))
    for i in range(3):
        chg.where(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(chg_dir)
    chg_schema = chg.drop("part").schema

    def merge_batch(batch_df, batch_id):
        snap = batch_df.sparkSession.read.parquet(current["dir"])
        b = batch_df
        merged = (
            snap.join(b, snap.o_orderkey == b.key, "full_outer")
            .where(F.coalesce(F.col("op"), F.lit("")) != "D")
            .select(
                F.coalesce(F.col("key"), F.col("o_orderkey")).alias("o_orderkey"),
                F.coalesce(F.col("new_status"), F.col("o_orderstatus")).alias(
                    "o_orderstatus"
                ),
                F.coalesce(F.col("new_totalprice"), F.col("o_totalprice")).alias(
                    "o_totalprice"
                ),
            )
        )
        # copy-on-write: new version dir, input stays intact during the
        # write; pointer advances only after the write succeeds
        next_dir = os.path.join(root, f"snapshot_v{batch_id + 1}")
        merged.write.mode("overwrite").parquet(next_dir)
        current["dir"] = next_dir

    q = (
        spark.readStream.schema(chg_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chg_dir)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(current["dir"])
    return final.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
