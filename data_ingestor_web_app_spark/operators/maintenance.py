"""Lake-maintenance jobs: small-file compaction and range-clustered
rewrite. On a 100 TB lake these two jobs ARE the difference between a
healthy table and an unscannable one — a streaming ingest (the reference's
file-per-record sink, reference/main.go R14, taken to its pathological
limit) produces millions of tiny files; compaction bin-packs them into
scan-efficient sizes, and range clustering rewrites data so min/max file
statistics actually prune.

Reference parity: generalizes reference/deploy + logrotate file hygiene
(R14/R20) from "delete old files" to "rewrite files for scan efficiency"
(SURVEY.md §2C widening).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query

_FRAGMENTS = 64
_TARGET_FILES = 4


@query(
    "maintenance_compact_small_files",
    oracle="""
    SELECT 'fragmented' AS phase, CAST(64 AS INTEGER) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem
    UNION ALL
    SELECT 'compacted', CAST(4 AS INTEGER), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(l_orderkey) AS BIGINT)
    FROM lineitem
    """,
)
def maintenance_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a fragmented table (64 shards, the
    streaming-ingest pathology) is rewritten into 4 right-sized files;
    per-phase file counts and content checksums prove the rewrite is
    lossless and actually changed the layout.

    The compaction itself is ONE round-robin repartition — no sort, no
    key shuffle semantics, pure re-bucketing, which is why lakehouse
    OPTIMIZE jobs are cheap relative to clustering. File counts come from
    the _metadata hidden column on read-back, not the driver's
    filesystem view — the same audit works on object stores. At 100 TB
    the target file count comes from total_bytes / target_file_size
    (here pinned to 4 for a deterministic oracle) and compaction runs
    per-partition-directory, embarrassingly parallel across partitions."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    root = scratch_dir("compact_")
    frag_path = os.path.join(root, "fragmented")
    li.repartition(_FRAGMENTS).write.mode("overwrite").parquet(frag_path)

    frag = spark.read.parquet(frag_path)
    comp_path = os.path.join(root, "compacted")
    frag.repartition(_TARGET_FILES).write.mode("overwrite").parquet(comp_path)
    comp = spark.read.parquet(comp_path)

    def audit(df: DataFrame, phase: str) -> DataFrame:
        return df.select(
            F.col("_metadata.file_name").alias("fn"), "l_orderkey"
        ).agg(
            F.lit(phase).alias("phase"),
            F.count_distinct("fn").cast("int").alias("n_files"),
            F.count("*").alias("n_rows"),
            F.sum("l_orderkey").cast("long").alias("key_sum"),
        )

    return audit(frag, "fragmented").unionByName(audit(comp, "compacted"))


@query(
    "maintenance_cluster_by_range",
    oracle="""
    SELECT 'clustered' AS layout, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-02-01 00:00:00'
    UNION ALL
    SELECT 'scattered', CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-02-01 00:00:00'
    """,
)
def maintenance_cluster_by_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered rewrite: orders written twice — repartitionByRange
    + sortWithinPartitions on o_orderdate (clustered) vs hash-scattered —
    then a one-month window is read back from each layout.

    The hash oracle checks the window's contents are identical from both
    layouts (the rewrite is lossless); the CLUSTERING payoff is asserted
    in pytest via _metadata.file_name: in the clustered layout the month
    lives in 1-2 files, in the scattered one it touches ~all 8 — which at
    100 TB is the difference between a scan that reads 1/50 of the table
    (parquet min/max footer stats skip non-overlapping files entirely)
    and one that reads all of it. repartitionByRange is a sampled range
    shuffle + local sort — the one-off cost that every later time-window
    query amortizes."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    root = scratch_dir("cluster_")
    clus_path = os.path.join(root, "clustered")
    (
        o.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(clus_path)
    )
    scat_path = os.path.join(root, "scattered")
    o.repartition(8, "o_orderkey").write.mode("overwrite").parquet(scat_path)

    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1995-02-01").cast("timestamp")

    def probe(path: str, layout: str) -> DataFrame:
        df = spark.read.parquet(path)
        win = df.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        return win.agg(
            F.lit(layout).alias("layout"),
            F.count("*").alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )

    return probe(clus_path, "clustered").unionByName(probe(scat_path, "scattered"))
