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
    """Multi-key sort with a materialized global position (`pos`), computed
    WITHOUT a single-partition window — the scalable global-row_number
    idiom:

    1. range-partition on the sort keys (each partition owns a contiguous
       key range, ascending by partition id — exactly what a global sort
       does under the hood), sort within partitions;
    2. row_number per partition (window partitioned by spark_partition_id —
       parallel, no data movement);
    3. global pos = local row_number + the total count of all earlier
       partitions. The per-partition counts are a tiny (n_partitions rows)
       aggregate; the running offset comes from a triangle self-join on that
       tiny side (not a window, so nothing ever coalesces to one partition),
       broadcast back onto the data.

    Same answer as ROW_NUMBER() OVER (ORDER BY ...) — the oracle proves it —
    but every stage is partition-parallel at 100 TB."""
    keys = [F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    c = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 8000)
    ranged = (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .repartitionByRange(8, *keys)
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("pid").orderBy(*keys)
    local = ranged.withColumn("lrk", F.row_number().over(w_local))
    counts = local.groupBy("pid").agg(F.count("*").alias("n"))
    earlier = counts.select(F.col("pid").alias("epid"), F.col("n").alias("en"))
    offsets = (
        counts.join(F.broadcast(earlier), F.col("epid") < F.col("pid"), "left")
        .groupBy("pid")
        .agg(F.coalesce(F.sum("en"), F.lit(0)).alias("off"))
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            (F.col("lrk") + F.col("off")).cast("int").alias("pos"),
        )
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
