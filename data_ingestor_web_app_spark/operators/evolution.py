"""Wave-14: schema evolution, distribution-shape moments, column crypto.

Schema evolution is the lake-operations reality the reference never hits
(its LogEntry struct is frozen in code, /root/reference/main.go:29-38):
production tables GAIN columns over time, and old files must keep
reading. The moments operator extends the stats family to 3rd/4th-order
shape; the crypto round trip covers at-rest column protection.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "scan_schema_evolution",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT COALESCE(o_orderpriority, '<pre-schema>') AS priority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM unioned GROUP BY 1
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution read: half the orders are written with the V1
    schema (no priority column), half with V2 (priority added); one
    ``mergeSchema`` read unions them, null-filling the missing column in
    old files — then aggregates across the generation boundary. This is
    the additive-column migration every long-lived table goes through.

    Scale shape: schema merge is a FOOTER operation (Spark reconciles the
    merged schema from file metadata, or from the catalog in production —
    set ``mergeSchema`` only on first read after a migration; it scans
    every footer). Data-page reads are unchanged; missing columns
    materialize as null vectors, costing nothing."""
    o = table(spark, sf_dir, "orders")
    out = os.path.join(scratch_dir("schema_evo_"), "orders")
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(f"{out}/gen=1")
    v2.write.mode("overwrite").parquet(f"{out}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(f"{out}/gen=1", f"{out}/gen=2")
    return merged.groupBy(
        F.coalesce("o_orderpriority", F.lit("<pre-schema>")).alias("priority")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "agg_moments_shape",
    oracle="""
    WITH mu AS (
        SELECT event_type, AVG(value) AS m, COUNT(*) AS n FROM events
        GROUP BY event_type
    ),
    cm AS (
        SELECT e.event_type, mu.n,
               AVG((e.value - mu.m) * (e.value - mu.m)) AS m2,
               AVG(POW(e.value - mu.m, 3)) AS m3,
               AVG(POW(e.value - mu.m, 4)) AS m4
        FROM events e JOIN mu ON mu.event_type = e.event_type
        GROUP BY e.event_type, mu.n
    )
    SELECT event_type, n,
           ROUND(m3 / POW(m2, 1.5), 6) AS skew,
           ROUND(m4 / (m2 * m2) - 3, 6) AS kurt
    FROM cm
    """,
)
def agg_moments_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shape per event type: population (Pearson) skewness
    m3/m2^1.5 and excess kurtosis m4/m2²−3 — Spark's built-in definitions.
    DuckDB's built-ins are SAMPLE-adjusted (verified: 1.9299 vs 1.9302 on
    the fixture), so the oracle derives the population moments explicitly
    from a two-pass central-moment computation; rounding to 6dp absorbs
    the accumulation-order difference between Spark's streaming moment
    updates and the oracle's AVG-of-powers.

    Scale shape: Spark's side is ONE map-side-combined groupBy (the
    built-ins carry running central moments in the partial); the oracle's
    two-pass join is the price of replaying the math in SQL, not something
    the engine executes."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.skewness("value"), 6).alias("skew"),
        F.round(F.kurtosis("value"), 6).alias("kurt"),
    )


@query(
    "fn_crypto_roundtrip",
    oracle="""
    SELECT doc_id, TRUE AS ok, LENGTH(text) AS n_plain
    FROM documents WHERE doc_id < 100
    """,
)
def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level at-rest encryption round trip: AES-encrypt the text
    column (ECB for cross-run determinism — production uses GCM, which
    salts a random IV per value), decrypt it back, and prove
    decrypt(encrypt(x)) == x per row. The oracle asserts the CONTRACT
    (every row round-trips) rather than re-implementing AES in SQL.

    Scale: both functions are JVM codegen expressions — the column never
    leaves the executor, and the ciphertext column is what a secured sink
    would persist."""
    key = "0123456789abcdef"  # 16-byte AES-128 demo key
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    dec = F.expr(
        f"cast(aes_decrypt(aes_encrypt(text, '{key}', 'ECB'), '{key}', 'ECB') as string)"
    )
    return d.select(
        "doc_id",
        (F.col("text") == dec).alias("ok"),
        F.length("text").alias("n_plain"),
    )
