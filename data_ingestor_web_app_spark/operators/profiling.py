"""Dataset profiling and sketch-style summaries — the "look at your data
before you train on it" operators a 100 TB corpus pipeline runs first.

Reference parity: the reference engine (reference/main.go) reports only a
global running count (R15/R16); these generalize that observability surface
to per-column statistics (SURVEY.md §2C widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "profile_columns",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           MIN(l_discount), MAX(l_discount)
    FROM lineitem
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: count / nulls / exact distinct / min / max for every
    numeric lineitem measure, as one tall (column_name, stats) frame.

    The Spark plan is ONE aggregate pass over the table — all three
    columns' statistics accumulate in the same partial-agg buffer (the
    oracle's three scans are the naive formulation; Spark's is the one you
    want at 100 TB). COUNT(DISTINCT x, y, z) in one agg triggers Spark's
    expand-based multi-distinct rewrite: 3× row expansion, still one
    shuffle, no extra table scans. The tall shape comes from a stack()
    unpivot of the single 1-row wide result — free."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.count("*").alias("n"),
        *[
            x
            for c in ("l_quantity", "l_extendedprice", "l_discount")
            for x in (
                (F.count("*") - F.count(c)).alias(f"null_{c}"),
                F.count_distinct(F.col(c)).alias(f"nd_{c}"),
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
            )
        ],
    )
    stack = ", ".join(
        f"'{c}', null_{c}, nd_{c}, min_{c}, max_{c}"
        for c in ("l_quantity", "l_extendedprice", "l_discount")
    )
    return wide.select(
        F.expr(
            f"stack(3, {stack}) AS (column_name, n_null, n_distinct, min_val, max_val)"
        ),
        "n",
    ).select("column_name", "n", "n_null", "n_distinct", "min_val", "max_val")


@query(
    "agg_linreg",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit via the SQL-standard regression
    aggregates (regr_slope / regr_intercept / regr_r2) — closed-form
    moments, not an iterative solver.

    Plan shape for 100 TB: the regr_* family is algebraic (sum, sum-of-
    squares, cross-product moments), so Spark computes map-side partials
    and merges — one shuffle of 3 groups × a handful of doubles, the same
    cost as a SUM. Rounded to 6 digits in both engines because the moment
    accumulation order differs across engines (floats), unlike exact
    integer sums."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@query(
    "agg_approx_topk",
    oracle="""
    SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4's approx_top_k sketch, unpacked to rows.

    maxItemsTracked (100000) far exceeds the event-type cardinality, so
    the sketch tracks every item exactly and the result EQUALS the exact
    group-by — which is what the oracle checks. At a 100 TB cardinality
    where exact tracking no longer fits, the same query degrades
    gracefully to approximate counts with a bounded-memory sketch that
    merges map-side — the reason to reach for it over groupBy + top-k:
    the shuffle carries one sketch per partition, not one row per key.
    k = 100 > |event_type domain|, so no rank-boundary tie ambiguity."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(F.expr("approx_top_k(event_type, 100, 100000)").alias("tk"))
        .select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("item"),
            F.col("x.count").cast("long").alias("cnt"),
        )
    )


@query(
    "scan_metadata_cols",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    UNION ALL
    SELECT 'orders.parquet', CAST(COUNT(*) AS BIGINT) FROM orders
    """,
)
def scan_metadata_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns: per-input-file row counts via the
    ``_metadata.file_name`` struct the parquet scan exposes — the lineage
    primitive behind "which file did this bad row come from" audits.

    No join, no extra scan: _metadata is produced by the FileScan itself
    (constant per split), so the plan is scan → partial count per file →
    one tiny shuffle. On a 100 TB lake this is the idiom for per-file
    quality quarantine; the single-file-per-table fixture makes the
    expected output analytic (the oracle states it directly)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("_metadata.file_name").alias("file_name")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("_metadata.file_name").alias("file_name")
    )
    return (
        li.unionByName(o)
        .groupBy("file_name")
        .agg(F.count("*").alias("n_rows"))
    )
