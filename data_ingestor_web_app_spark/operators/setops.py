"""Sorts, limits, set operations (SURVEY §2B "Sorts / limits / set ops")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ROW_NUMBER() OVER (ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC) AS pos
    FROM customer
    WHERE c_acctbal > 8000
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort. The driver's hash is order-insensitive, so the sort
    position is materialized as `pos` to make ordering checkable. The global
    row_number is a single-partition window — fine for a filtered result;
    a full-table global sort at 100 TB would use orderBy (range-partitioned
    TakeOrdered/Sort) without the position column, or zipWithIndex-style
    partition-offset arithmetic."""
    c = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 8000)
    w = Window.orderBy(F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey", "c_mktsegment", "c_acctbal", F.row_number().over(w).alias("pos")
    )


@query(
    "limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject — each
    task keeps a k-heap, driver merges k*tasks rows; never a full global sort.
    Total order via (orderkey, linenumber) tie-break."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


_UNION_LEFT = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_UNION_RIGHT = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000"


@query("set_union_all", oracle=f"{_UNION_LEFT} UNION ALL {_UNION_RIGHT}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle at all (just concatenated partitions)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    left = c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    right = o.where(F.col("o_totalprice") > 350000).select(F.col("o_custkey").alias("custkey"))
    return left.unionByName(right)


@query("set_union_distinct", oracle=f"{_UNION_LEFT} UNION {_UNION_RIGHT}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — union + distinct (one hash-agg shuffle on the key)."""
    return set_union_all(spark, sf_dir).distinct()


@query("set_intersect", oracle=f"{_UNION_LEFT} INTERSECT {_UNION_RIGHT}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics) — BUILDING customers who placed
    a >350k order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    left = c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    right = o.where(F.col("o_totalprice") > 350000).select(F.col("o_custkey").alias("custkey"))
    return left.intersect(right)


@query("set_except", oracle=f"{_UNION_LEFT} EXCEPT {_UNION_RIGHT}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference — BUILDING customers with no >350k order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    left = c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    right = o.where(F.col("o_totalprice") > 350000).select(F.col("o_custkey").alias("custkey"))
    return left.subtract(right)  # EXCEPT (distinct semantics), matching DuckDB
