"""Point-in-interval join via bucketization — the scale pattern for range
joins with NO equality key: bin both sides so the candidate space becomes
an equi-join, then verify the exact range predicate on the survivors.

Reference parity: SURVEY.md §2C widening (no reference counterpart); the
shape complements join_theta_range (banded self-join on a numeric key) and
join_asof_banded (nearest-below with horizon) with the third classic:
containment of a point in an interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_WEEK_S = 7 * 86400  # bin width == interval length, so ≤ 2 candidate bins


@query(
    "join_interval_bucket",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM orders
    JOIN lineitem
      ON l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 7 DAY
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderkey
    """,
)
def join_interval_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipments falling inside each urgent order's 7-day window — a pure
    range-containment join (no shared key), executed as an equi-join.

    Bucketization: both sides map time onto week-sized bins; because the
    bin width equals the interval length, an interval overlaps AT MOST
    two bins, so each order explodes into exactly 2 candidate bins and
    the join becomes `point.bin = interval.bin` — an ordinary shuffled
    equi-join with the exact [start, end) predicate re-checked on
    candidates. The DuckDB oracle runs the naive unbinned range join, so
    the hash match proves the binning is LOSSLESS.

    At 100 TB: the naive plan is a BroadcastNestedLoopJoin (O(n·m) —
    unusable); this plan shuffles each side once on a uniform time bin.
    Bin-count skew = temporal hotspots, handled like any key skew (AQE /
    salting). The 2× duplication of the tiny interval side is the entire
    overhead."""
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("w_start"),
            F.unix_seconds(F.col("o_orderdate").cast("timestamp")).alias("s0"),
        )
    )
    o2 = o.select(
        "o_orderkey",
        "w_start",
        F.explode(
            F.array(
                F.floor(F.col("s0") / _WEEK_S),
                F.floor(F.col("s0") / _WEEK_S) + 1,
            )
        ).alias("bin"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate",
        "l_quantity",
        F.floor(
            F.unix_seconds(F.col("l_shipdate").cast("timestamp")) / _WEEK_S
        ).alias("bin"),
    )
    in_window = (F.col("l_shipdate") >= F.col("w_start")) & (
        F.col("l_shipdate") < F.col("w_start") + F.expr("INTERVAL 7 DAYS")
    )
    return (
        li.join(o2, "bin")
        .where(in_window)
        .groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )
