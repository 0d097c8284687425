"""Runtime pruning operators: dynamic partition pruning and runtime
bloom-filter joins.

These are the two Catalyst features that decide whether a 100 TB
fact-table join reads 100 TB or 1 TB:

- **Dynamic partition pruning (DPP)**: a filter on the dim side of a
  star join is turned into a partition filter on the fact scan at
  runtime, so only the matching partition directories are listed and
  read. On a date-partitioned 100 TB fact table a one-quarter dim
  filter prunes ~96% of the scan before a single row is read.
- **Runtime bloom filter**: when the join key is NOT the partition
  key, Spark can still build a bloom filter from the (filtered, small)
  creation side and push `might_contain` into the big side's scan,
  dropping most non-matching rows before the shuffle. This is the
  shuffle-volume killer for selective fact-fact joins.

Reference parity: the reference (a 319-LoC ingest server,
reference/main.go) has no scan layer at all; these generalize its
"only touch what you must" file hygiene (R14/R20 rotation) to
query-time IO avoidance (SURVEY.md §2C widening).

Both queries return plain aggregates so the DuckDB oracle checks
result parity; the pruning/bloom plan shapes are asserted in
tests/test_wave7.py (dynamicpruning expression in the DPP scan,
might_contain in the bloom join's big-side filter).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "join_dpp_dates",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') IN ('1995-01', '1995-02', '1995-03')
    GROUP BY 1
    ORDER BY o_month
    """,
)
def join_dpp_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join against a month-partitioned fact with dynamic partition
    pruning: orders are laid out as `o_month=YYYY-MM/` directories (the
    standard time-partitioned lake layout), the calendar dim is filtered
    to one quarter, and Catalyst turns that dim filter into a runtime
    PartitionFilter on the fact scan — only 3 of ~84 month directories
    are listed and read.

    The dim is a generated calendar (sequence + explode), the idiomatic
    replacement for a date dimension table; it is broadcast, and the
    DPP subquery reuses that broadcast. At 100 TB the fact write
    happens once at ingest; every quarter-scoped query then reads
    ~3.5% of the table. tests/test_wave7.py asserts the
    `dynamicpruning` expression is present in the fact scan."""
    o = table(spark, sf_dir, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    root = os.path.join(scratch_dir("dpp_"), "orders_by_month")
    o.select("o_orderkey", "o_totalprice", "o_month").write.partitionBy(
        "o_month"
    ).mode("overwrite").parquet(root)
    fact = spark.read.parquet(root)

    months = F.explode(
        F.expr("sequence(date'1992-01-01', date'1998-12-01', interval 1 month)")
    ).alias("m")
    dim = (
        spark.range(1)
        .select(months)
        .select(
            F.date_format("m", "yyyy-MM").alias("month_str"),
            F.concat(
                F.year("m").cast("string"),
                F.lit("-Q"),
                F.quarter("m").cast("string"),
            ).alias("qtr"),
        )
    )
    return (
        fact.join(
            dim.where(F.col("qtr") == "1995-Q1"),
            fact.o_month == dim.month_str,
        )
        .groupBy("o_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_month")
    )


@query(
    "join_bloom_runtime",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           COUNT(*) AS n_items,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
      AND EXTRACT(year FROM o_orderdate) = 1995
    GROUP BY 1
    ORDER BY o_month
    """,
)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-fact join with a runtime bloom filter: the
    filtered orders side (urgent, one year — ~3% of rows) builds a
    bloom filter over o_orderkey, and Catalyst injects
    `might_contain(xxhash64(l_orderkey))` into the lineitem scan, so
    ~97% of lineitem rows are dropped BEFORE the shuffle. On a 100 TB
    lineitem this converts a full-table shuffle into a ~3% shuffle —
    the bloom's false positives only cost a few extra shuffled rows;
    the join itself stays exact (hence the plain-join oracle).

    Runs on a `newSession()` clone so the conf posture (shuffle join
    forced, application-side threshold lowered to fixture scale) can't
    leak into sibling queries; on a real cluster the default
    thresholds (10 MB creation side / 10 GB scan side) trigger the
    same plan without any tuning. tests/test_wave7.py asserts
    `might_contain` appears in the optimized plan."""
    ns = spark.newSession()
    # fixture-scale trigger thresholds; at 100 TB the defaults fire.
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ns.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ns.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1",
    )
    li = table(ns, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = table(ns, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1995)
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("o_month"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("o_month")
    )
