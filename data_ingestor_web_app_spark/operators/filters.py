"""Projections, filters, predicates (SURVEY §2B).

Reference parity: the reference's only filter is the empty-payload drop
(/root/reference/main.go:298-301) and level gating (main.go:30-41); its only
projection is the LogEntry build (main.go:101-114). These queries exercise
the generalized predicate/projection surface over the fixture tables; all are
single-stage, fully pushed-down scans — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price,
           l_extendedprice * l_discount AS disc_amount
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection — stays in whole-stage codegen, no Python.

    Deliberately unrounded: identical double expressions evaluate bit-exact
    in both engines, whereas ROUND differs on representation boundaries
    (Spark HALF_UP on the exact binary expansion vs DuckDB's libm round).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("net_price"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amount"),
    )


@query(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount <= 0.05
      AND l_linestatus = 'F' AND l_returnflag <> 'N'
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<,<=,=,!=,> comparison predicates, AND-combined; all pushed to parquet."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_linestatus") == "F")
        & (F.col("l_returnflag") != "N")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderstatus LIKE 'F%'
      AND o_custkey IS NOT NULL
      AND NOT (o_orderstatus = 'P' OR o_totalprice < 0)
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / IS NULL / boolean composition."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderstatus").like("F%")
        & F.col("o_custkey").isNotNull()
        & ~((F.col("o_orderstatus") == "P") | (F.col("o_totalprice") < 0))
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@query(
    "filter_date_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-style shipdate range; at 100 TB this is the partition-pruning
    predicate (events/lineitem would be date-partitioned)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        # date emitted as a string: DuckDB DATE round-trips through pandas as
        # midnight datetime, so raw DATE columns can't hash-match
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )
