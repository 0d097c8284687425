"""Fixture table IO.

One parquet file per table under ``{sf_dir}/`` (TESTDATA.md). Loading is a
plain ``spark.read.parquet`` so Catalyst's parquet source handles predicate
pushdown / column pruning / partition coalescing; at 100 TB the same call
points at a partitioned directory tree and nothing else changes.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def scratch_dir(prefix: str = "scratch_") -> str:
    """A fresh local scratch directory for harness artifacts (replay
    chunks, sentinel files, checkpoints, sink targets).

    Honors ``SPARK_GRAFT_SCRATCH`` (created on demand) so the replay
    harnesses keep working when ``sf_dir`` is NOT a writable local path —
    e.g. fixtures served from a read-only mount or an object store
    (VERDICT r10 item 7). Defaults to the system temp dir. All harness
    temp dirs flow through here; nothing is ever written under sf_dir."""
    root = os.environ.get("SPARK_GRAFT_SCRATCH")
    if root:
        os.makedirs(root, exist_ok=True)
    elif os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        # r11: streaming checkpoints/WALs fsync on every micro-batch commit;
        # on a disk-backed system temp that fixed cost dominates short
        # replays. Scratch artifacts are one-shot (fresh mkdtemp, never
        # resumed across runs), so a tmpfs default is safe locally; real
        # deployments point SPARK_GRAFT_SCRATCH (or the checkpoint conf) at
        # durable storage.
        root = "/dev/shm/spark_graft_scratch"
        os.makedirs(root, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=root or None)


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any SparkSession (incl. the driver's own, which doesn't use our
    session factory) safe for the fixtures and oracle parity:
    - nanosAsLong: events.parquet is TIMESTAMP(NANOS), unreadable otherwise;
    - UTC session timezone: date_format/unix_timestamp parity with DuckDB
      (reference writes UTC RFC3339, main.go:102)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # right-size shuffle/state parallelism for the local-mode fixture scale;
    # a driver-default 200 partitions makes every stateful streaming batch
    # pay ~6x task overhead for no gain at these volumes
    if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small literal frame as pure JVM literals:
    ``range(1) -> inline(array(struct(...)))`` cast to ``schema``.

    Drop-in for ``spark.createDataFrame(rows, schema)`` on small constant
    grids (r11, guide §4). createDataFrame parallelizes PICKLED rows, so
    the frame is a Python-RDD scan: every evaluation is a Python-worker
    round trip, and under a BroadcastNestedLoop/Cartesian build the inner
    Python partition is re-evaluated PER PROBE ROW — measured: a 36-row
    literal crossJoin (pipeline_lsh_tuning_curve) burned ~11 s inside one
    task on repeated Python evaluations; the literal form runs in
    whole-stage codegen with no Python anywhere. Single partition, same
    column names/types as createDataFrame(rows, schema)."""
    from pyspark.sql.types import StructType

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    names = [f.name for f in st.fields]
    structs = [
        F.struct(*[F.lit(v).alias(n) for v, n in zip(r, names)]) for r in rows
    ]
    return (
        spark.range(0, 1, 1, 1)
        .select(F.inline(F.array(*structs)))
        .to(st)
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ts is TIMESTAMP(NANOS) in the original driver fixture; with
            # nanosAsLong it arrives as ns-since-epoch. Truncate to µs exactly
            # as DuckDB does (fixture data is µs-aligned, so this is lossless
            # — FIXTURES.md).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Regenerated fixtures store TIMESTAMP(MICROS) without timezone,
            # which Spark reads as TIMESTAMP_NTZ. The engine (and the round-1
            # data) standardizes on TIMESTAMP with the session pinned to UTC;
            # the cast is wall-clock-preserving under that pin and keeps
            # every downstream window/date_format/oracle comparison byte-
            # identical to DuckDB's naive-timestamp read of the same file.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
