"""Wave-12 experiment analysis and raw-text source.

events_ab_test_lift generalizes the reference's aggregate report
(/root/reference/main.go:259-289) to the two-sample comparison every
product pipeline runs; source_text_lines closes the source-format matrix
(parquet/CSV/ORC/JSON/binaryFile/custom-DataSource + raw text).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "events_ab_test_lift",
    oracle="""
    WITH assigned AS (
        SELECT user_id % 2 AS variant,
               (event_type = 'purchase')::INT AS is_p,
               value
        FROM events
    ),
    per AS (
        SELECT variant,
               COUNT(*) AS n,
               SUM(is_p) AS conv
        FROM assigned GROUP BY variant
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
            MAX(CASE WHEN variant = 0 THEN conv END) AS conv_a,
            MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
            MAX(CASE WHEN variant = 1 THEN conv END) AS conv_b
        FROM per
    )
    SELECT n_a, CAST(conv_a AS BIGINT) AS conv_a, n_b, CAST(conv_b AS BIGINT) AS conv_b,
           ROUND(conv_a * 1.0 / n_a, 6) AS cr_a,
           ROUND(conv_b * 1.0 / n_b, 6) AS cr_b,
           ROUND((conv_b * 1.0 / n_b) - (conv_a * 1.0 / n_a), 6) AS abs_lift,
           ROUND(
             ((conv_b * 1.0 / n_b) - (conv_a * 1.0 / n_a))
             / SQRT( ((conv_a + conv_b) * 1.0 / (n_a + n_b))
                   * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                   * (1.0 / n_a + 1.0 / n_b) ), 6) AS z_score
    FROM wide
    """,
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test conversion lift: deterministic hash split (user_id parity),
    per-variant conversion rates, absolute lift, and the pooled
    two-proportion z-score — the standard experiment readout, computed as
    one aggregate pass + one scalar projection.

    Scale shape: a single map-side-combined groupBy(variant) over raw
    events (2 groups), pivoted to one row; everything after the aggregate
    is O(1) scalar math. At 100 TB the variant assignment would hash a
    stable user key (xxhash, not %2) but the plan is identical."""
    assigned = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).alias("variant"),
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    per = assigned.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("is_p").alias("conv")
    )
    wide = per.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    cr_a = F.col("conv_a") * 1.0 / F.col("n_a")
    cr_b = F.col("conv_b") * 1.0 / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z = (cr_b - cr_a) / F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(cr_a, 6).alias("cr_a"),
        F.round(cr_b, 6).alias("cr_b"),
        F.round(cr_b - cr_a, 6).alias("abs_lift"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "source_text_lines",
    oracle="SELECT text AS value FROM documents",
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-lines source round trip: the corpus is written one document
    per line (the wire format of most web-scale text dumps) and read back
    with ``spark.read.text`` — each line becomes a `value` row, verified
    against the original parquet column. Completes the source matrix alongside
    CSV/ORC/JSON/binaryFile/custom-DataSource.

    Scale: text files split on line boundaries, so a 100 TB dump reads
    with full parallelism; compression should be splittable (bzip2/zstd
    frames) or files pre-sharded — same rule the reference's logrotate
    sharding follows (reference/configs/logrotate.conf:1-12)."""
    d = table(spark, sf_dir, "documents")
    out = os.path.join(scratch_dir("text_lines_"), "docs")
    d.select("text").coalesce(4).write.mode("overwrite").text(out)
    return spark.read.text(out)
