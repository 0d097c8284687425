"""Aggregations (SURVEY §2B "Aggregations").

Reference parity: the reference's metrics state is a running global
count/sum aggregate held in atomics (/root/reference/main.go:60-65,312-313)
— `agg_global` is its batch form; the streaming form lives in
streaming/queries.py. Everything else generalizes over the fixture tables.

All groupBys here are partial-aggregated map-side by Catalyst before the
shuffle (HashAggregate → Exchange → HashAggregate), so network volume is
#groups, not #rows — the property that makes them survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           COUNT(DISTINCT l_returnflag) AS n_flags
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregate — the batch twin of the reference's
    ServerMetrics counters (totalConnections/processedRequests/bytes)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@query(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — TPC-H Q1 pricing summary. Scan → pushed filter → partial
    hash-agg → exchange(2 keys) → final agg. This is `entry()`'s query."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           ROUND(SUM(DISTINCT l_quantity), 2) AS sum_distinct_qty
    FROM lineitem
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM DISTINCT — Catalyst expands to a two-phase expand+agg plan."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for distinct
    users — mergeable sketch, no giant exact-distinct shuffle.

    Promoted from rows-only to hash-exact in r6 (VERDICT item 7): the HLL
    estimate itself is engine-specific, so the checked output carries the
    exact distinct count plus the ±5% ACCURACY BOUND AS A COLUMN —
    `approx_within_5pct` is computed in Spark from both aggregates in one
    groupBy and the oracle asserts it TRUE for every group, making the
    bound a SQL-checked invariant instead of a pytest-only one.
    Production use reads the estimate directly; this query is the
    operator plus its proof obligation."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("n_exact_users"),
    )
    return agg.select(
        "event_type",
        "n_exact_users",
        # greatest(n,1): a group whose user_id values are all NULL has
        # exact-distinct 0; 0/0 would make the invariant column NULL and
        # surface only as an opaque hash mismatch vs the oracle's TRUE
        (
            F.abs(F.col("approx_users") - F.col("n_exact_users"))
            / F.greatest(F.col("n_exact_users"), F.lit(1))
            <= 0.05
        ).alias("approx_within_5pct"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 4) AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_linestatus,
           ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS median_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles. At 100 TB the drop-in replacement is
    approx_percentile (t-digest sketch, mergeable); exact is fine per-group
    here and hash-checkable."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 1500000 AND COUNT(*) >= 5
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.sum("o_totalprice").alias("_raw_spend"),
        )
        .where((F.col("_raw_spend") > 1500000) & (F.col("n_orders") >= 5))
        .drop("_raw_spend")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (status → status+priority → grand total)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority")).alias("gid"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both flag dimensions (all 4 grouping sets)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).alias("gid"),
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_lines", "sum_qty")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two disjoint single-column groupings in one
    pass (Catalyst Expand operator, one scan)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           STRING_AGG(c_name, '|' ORDER BY c_name) AS names,
           COUNT(*) AS n_customers
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sorted list, emitted as a joined string so the hash check
    is order-exact (collect_list alone is unordered across tasks)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias("names"),
            F.count("*").alias("n_customers"),
        )
    )
