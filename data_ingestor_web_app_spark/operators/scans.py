"""Scans, sources and sinks (SURVEY §2B "Scans / sources / sinks").

Reference parity: the reference's only "table" is an append-only JSON-lines
log (/root/reference/main.go:86-92,116-120) plus a legacy file-per-record
text sink (README.md:3,24). Here those become parquet/json/text DataFrame
sinks; scans are plain parquet reads where Catalyst pushes predicates and
prunes columns into the file source (verify with .explain: PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan. At 100 TB this is a partitioned directory scan; the
    vectorized parquet reader keeps it columnar end-to-end."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "scan_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
    """,
)
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with projection + predicate pushdown: only 5 of 11 lineitem
    columns are read and both predicates reach the parquet reader
    (PushedFilters: [LessThan(l_shipdate,...), GreaterThanOrEqual(...)]).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "sink_json_lines",
    oracle="SELECT doc_id, lang, n_chars FROM documents",
)
def sink_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: append-only JSON-lines sink (main.go:116-120), then read back.

    Write path is the same `df.write.json` that at scale fans out one file
    per task; round-trip proves the sink is lossless for the LogEntry-shaped
    columns. The projection is ints + strings only, which JSON round-trips
    exactly, so the oracle is simply the source projection — the hash
    check certifies write+read losslessness, not just row counts.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = os.path.join(scratch_dir("sink_json_"), "docs")
    docs.write.mode("overwrite").json(out)
    back = spark.read.json(out)
    return back.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("lang"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@query(
    "sink_partitioned_text",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders",
)
def sink_partitioned_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14/R20: date-partitioned text sink (legacy file-per-record ./data dir,
    logrotate daily rotation). Partitioning column = order date; retention at
    scale is `WHERE d >= retention_horizon` partition pruning + drop.
    The pipe-delimited line format round-trips keys and statuses exactly,
    so the oracle is the source projection — hash equality proves the
    partitioned write + text read-back loses nothing.
    """
    orders = table(spark, sf_dir, "orders")
    lines = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("d"),
        F.concat_ws("|", F.col("o_orderkey"), F.col("o_orderstatus")).alias("value"),
    )
    out = os.path.join(scratch_dir("sink_text_"), "orders")
    lines.write.mode("overwrite").partitionBy("d").text(out)
    back = spark.read.format("text").load(out)  # partition col `d` recovered from dir layout
    return back.select(
        F.split_part(F.col("value"), F.lit("|"), F.lit(1)).cast("long").alias("o_orderkey"),
        F.split_part(F.col("value"), F.lit("|"), F.lit(2)).alias("o_orderstatus"),
    )


def prune_partitions(spark: SparkSession, path: str, column: str, cutoff: str) -> list[str]:
    """R20 retention util — the logrotate analogue
    (reference/configs/logrotate.conf:1-12: daily rotate, keep 7): delete
    hive-style partition directories ``column=value`` whose value sorts
    strictly below ``cutoff``. Uses the Hadoop FileSystem API via the JVM
    gateway, so the same code prunes local dirs, HDFS, and s3a:// — this is
    a driver-side metadata operation (one LIST + one DELETE per expired
    partition), no data is read. Returns the pruned partition values."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    pruned = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(column + "="):
            value = name.split("=", 1)[1]
            if value < cutoff:
                fs.delete(status.getPath(), True)
                pruned.append(value)
    return sorted(pruned)


@query(
    "retention_prune",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_dt FROM events)
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
           COUNT(*) AS n_events
    FROM events, mx
    WHERE CAST(ts AS DATE) >= max_dt - 6
    GROUP BY 1
    """,
)
def retention_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20 end-to-end: date-partitioned sink + retention pruning + read-back.

    Events are written partitioned by day (dt=yyyy-MM-dd), then
    ``prune_partitions`` deletes every partition older than a 7-day window
    anchored at the corpus max date (deterministic — wall-clock anchoring
    would flap the oracle hash). The read-back per-day counts hash-match the
    source table restricted to the window, proving (a) the sink is lossless
    and (b) exactly the expired partitions were removed. At 100 TB the
    read-back is partition-pruned directory listing; the prune itself never
    touches row data."""
    e = table(spark, sf_dir, "events")
    days = e.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "event_id")
    out = os.path.join(scratch_dir("retention_"), "events")
    days.write.mode("overwrite").partitionBy("dt").parquet(out)

    import datetime

    max_dt = days.agg(F.max("dt")).first()[0]  # one scalar to the driver
    cutoff = (datetime.date.fromisoformat(max_dt) - datetime.timedelta(days=6)).isoformat()
    prune_partitions(spark, out, "dt", cutoff)

    back = spark.read.parquet(out)
    return back.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.count("*").alias("n_events")
    )


def compress_aged_partitions(
    spark: SparkSession, path: str, column: str, cutoff: str, codec: str = "zstd"
) -> list[str]:
    """R20 retention util, step 2 — the logrotate ``compress`` analogue
    (reference/configs/logrotate.conf:3: rotated logs are gzip'd before
    they age out): rewrite hive-style partition directories
    ``column=value`` whose value sorts strictly below ``cutoff`` with a
    heavier codec, swapping the rewritten directory in atomically
    (write fresh dir → delete old → rename). Content is untouched — only
    the physical encoding changes — so any read-back oracle must
    hash-match. Driver does metadata ops only (list/delete/rename); the
    row data is rewritten by executors, one partition at a time, so at
    100 TB this is a rolling background maintenance job whose unit of
    work is one date partition. Returns the compressed partition values."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    aged = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(column + "="):
            value = name.split("=", 1)[1]
            if value < cutoff:
                aged.append((value, name, status.getPath()))

    def _rewrite(entry):
        value, name, old_path = entry
        part_dir = os.path.join(path, name)
        tmp_dir = os.path.join(path, "." + name + ".zstd_rewrite")
        (
            spark.read.parquet(part_dir)
            .write.mode("overwrite")
            .option("compression", codec)
            .parquet(tmp_dir)
        )
        fs.delete(old_path, True)
        fs.rename(
            jvm.org.apache.hadoop.fs.Path(tmp_dir),
            jvm.org.apache.hadoop.fs.Path(part_dir),
        )
        return value

    # r11 (guide §2.6): each partition rewrite is an independent
    # read+write job on a distinct directory; running them strictly
    # serially left the cluster idle during every job's tail (~26
    # single-partition jobs at sf0.01 ≈ 8 s of mostly scheduling). A
    # small driver-side pool overlaps them — per-partition atomicity
    # (write fresh dir → delete old → rename) is unchanged because each
    # worker touches only its own partition directory.
    from concurrent.futures import ThreadPoolExecutor

    if not aged:
        return []
    with ThreadPoolExecutor(max_workers=min(8, len(aged))) as pool:
        compressed = list(pool.map(_rewrite, aged))
    return sorted(compressed)


@query(
    "retention_compress_aged",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS max_dt FROM events)
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
           COUNT(*) AS n_events,
           CAST(ts AS DATE) < max_dt - 3 AS aged
    FROM events, mx
    GROUP BY 1, 3
    """,
)
def retention_compress_aged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20 complete lifecycle: date-partitioned sink → zstd-compress
    partitions older than a 4-day hot window → read-back. The per-day
    counts hash-match the source (content identity through the codec
    rewrite), and the ``aged`` flag marks exactly the partitions that were
    rewritten. Physical shrink (zstd < snappy bytes) is asserted in
    pytest — byte sizes aren't SQL-oracle-able."""
    import datetime

    e = table(spark, sf_dir, "events")
    days = e.select(F.date_format("ts", "yyyy-MM-dd").alias("dt"), "event_id", "props")
    out = os.path.join(scratch_dir("retention_zstd_"), "events")
    days.write.mode("overwrite").option("compression", "snappy").partitionBy("dt").parquet(out)

    max_dt = days.agg(F.max("dt")).first()[0]  # one scalar to the driver
    cutoff = (datetime.date.fromisoformat(max_dt) - datetime.timedelta(days=3)).isoformat()
    compress_aged_partitions(spark, out, "dt", cutoff)

    back = spark.read.parquet(out)
    return back.groupBy(F.col("dt").cast("string").alias("dt")).agg(
        F.count("*").alias("n_events"),
        F.first(F.col("dt").cast("string") < F.lit(cutoff)).alias("aged"),
    )


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source: write customer as headered CSV, read back with an
    EXPLICIT schema (never inferSchema at scale — it double-scans), values
    hash-match the parquet original. Doubles survive via round-trip text
    repr (Spark writes shortest-repr, reads back bit-identical)."""
    c = table(spark, sf_dir, "customer")
    out = os.path.join(scratch_dir("src_csv_"), "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string")
        .option("header", True)
        .csv(out)
    )
    return back


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip (the other columnar format Spark ships
    natively) — same pushdown/pruning machinery as parquet."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    out = os.path.join(scratch_dir("src_orc_"), "orders")
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines SOURCE with value fidelity: write the events scalars as
    JSONL, read them back with an explicit schema, and hash-match against
    the original parquet rows. Proves the JSON path round-trips doubles
    exactly (Spark writes shortest-round-trip decimal reprs), not just
    "row counts look right" — the stronger claim sink_json_lines (rows-only
    by design: timestamps re-type) can't make.

    At 100 TB an explicit schema on read is mandatory: schema inference is
    a full extra pass over every byte before the real job starts."""
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    out = os.path.join(scratch_dir("src_json_"), "events")
    e.write.mode("overwrite").json(out)
    return spark.read.schema(
        "event_id long, user_id long, event_type string, value double"
    ).json(out)
