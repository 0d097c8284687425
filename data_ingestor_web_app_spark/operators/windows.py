"""Window functions (SURVEY §2B "Window functions").

All windows partition by a key (custkey / user_id) — the shuffle is on the
partition key and each window is evaluated inside one task, which scales as
long as no single key's partition exceeds executor memory (true for
per-customer / per-user cardinalities). No global (unpartitioned) windows in
the hot path — the one in setops.sort_multi is annotated as test-scale only.

Determinism: every ORDER BY carries a unique tie-break column so rank/
row_number values hash-match DuckDB (SURVEY §7 rule 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "win_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()  OVER w_unique AS rn,
           RANK()        OVER w_ties   AS rnk,
           DENSE_RANK()  OVER w_ties   AS drnk,
           NTILE(4)      OVER w_unique AS quartile,
           ROUND(PERCENT_RANK() OVER w_ties, 4) AS pct_rank,
           ROUND(CUME_DIST()    OVER w_ties, 4) AS cume
    FROM orders
    WINDOW
      w_unique AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      w_ties   AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE))
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family. Two specs: a total order (row_number/ntile need it for
    determinism) and a date-only order so rank/dense_rank/percent_rank/cume
    actually see ties."""
    o = table(spark, sf_dir, "orders").withColumn("od", F.col("o_orderdate").cast("date"))
    w_unique = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy("od")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_unique).alias("quartile"),
        F.round(F.percent_rank().over(w_ties), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w_ties), 4).alias("cume"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_type) OVER w AS first_type,
           value - COALESCE(LAG(value) OVER w, value) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value over the per-user event timeline."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_v = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        lag_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
        (F.col("value") - F.coalesce(lag_v, F.col("value"))).alias("delta"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per user over event time (reference's running byte/
    request counters, main.go:312-313, keyed by user instead of global)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS moving_avg7
    FROM events
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average per user."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg7"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: how many of the customer's orders fall within
    a 50k price band below this one."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-50000, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS rank_in_group
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number + filter — Spark pushes the
    rn<=3 limit into the window sort (WindowGroupLimit) so each partition
    only materializes k rows; this is the scalable per-key top-k."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").alias("rank_in_group"))
    )


@query(
    "win_rolling_distinct",
    oracle="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS n_types
    FROM events
    """,
)
def win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count: how many distinct event types each user hit
    in their trailing 11 events — the behavioral-diversity feature. Spark
    has no COUNT(DISTINCT) window, so the idiom is
    size(collect_set(x) OVER w): the set lives only inside the window
    operator, never materialized per row downstream. Frame is 11 rows, so
    state per row is bounded by min(11, |type domain|) — at 100 TB the
    cost profile is identical to any trailing-frame window: one shuffle on
    user_id, per-user sort, no global sort. (An UNBOUNDED frame would
    instead want the cumulative-dedup formulation: flag first occurrences
    with lag-free row_number over (user, type), then a running sum.)"""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types"),
    )
