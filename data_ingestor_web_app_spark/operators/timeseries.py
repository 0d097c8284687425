"""Time-series rollups over the events table: bucket downsampling with
gap-fill + last-observation-carried-forward, and OHLC aggregation — the
hypertable/continuous-aggregate shapes of a time-series store, expressed
as plain Catalyst plans.

Bucketing uses epoch-second arithmetic (floor(epoch/width)*width) in BOTH
engines so bucket boundaries are bit-identical; bucket timestamps emit as
formatted strings (cross-engine date rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "events_gapfill_locf",
    oracle="""
    WITH actual AS (
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT) AS bucket_s,
               ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT MIN(bucket_s) AS lo, MAX(bucket_s) AS hi FROM actual
    ),
    spine AS (
        SELECT t.event_type, g.bucket_s
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(lo, hi, 300)) AS bucket_s
                    FROM bounds) g
    )
    SELECT s.event_type,
           STRFTIME(TO_TIMESTAMP(s.bucket_s), '%Y-%m-%d %H:%M:%S') AS bucket,
           COALESCE(a.n, 0) AS n,
           LAST_VALUE(a.avg_value IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.bucket_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM spine s
    LEFT JOIN actual a ON a.event_type = s.event_type AND a.bucket_s = s.bucket_s
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute downsample with gap-fill: a dense bucket spine (sequence
    over the observed range x distinct event types) left-joins the actual
    per-bucket averages; empty buckets carry the last observed value
    forward (LOCF) via last(ignorenulls) over an ordered per-type window.

    Scale shape: the aggregate shrinks events to one row per (type, bucket)
    map-side; the spine is generated, not scanned (sequence+explode = no
    input IO); the LOCF window partitions by event_type — parallel across
    types, and for a high-cardinality partition key this is the standard
    time-series fill plan. Bucket math is epoch arithmetic, identical in
    both engines."""
    e = table(spark, sf_dir, "events")
    bucket_s = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long")
    # avg computed as round(sum, 2) / n, NOT round(avg, 4): the raw values
    # are exact 2-decimal quantities, so rounding the SUM at 2dp never hits
    # a half-way boundary (the true value's 3rd decimal is always 0), and
    # the division of bit-identical doubles is bit-identical in any IEEE
    # engine. round(avg, k) by contrast lands exactly half-way whenever the
    # bucket count is a power of two — measured 1-in-43k rows at sf0.1.
    actual = (
        e.select("event_type", bucket_s.alias("bucket_s"), "value")
        .groupBy("event_type", "bucket_s")
        .agg(
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.count("*").alias("n"),
        )
    )
    bounds = actual.agg(F.min("bucket_s").alias("lo"), F.max("bucket_s").alias("hi"))
    spine = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(300))).alias("bucket_s"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(actual, ["event_type", "bucket_s"], "left")
        .select(
            "event_type",
            F.from_unixtime("bucket_s", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("avg_value", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


@query(
    "events_ohlc_downsample",
    oracle="""
    SELECT event_type,
           STRFTIME(TO_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS bucket,
           ARG_MIN(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           ARG_MAX(value, ts) AS close,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def events_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the classic
    financial/metrics downsample. open/close are min_by/max_by on the event
    time (timestamps are unique in the fixture, so the argmin is total);
    high/low are plain extrema. ONE aggregation pass, fully map-side
    partial: every task emits one candidate bar per (type, bucket), the
    final combine keeps the arg-extrema — no window, no sort, no second
    scan. Raw values pass through unrounded (per-row float rule: only
    computed aggregates get rounded)."""
    e = table(spark, sf_dir, "events")
    bucket_s = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    return (
        e.select("event_type", bucket_s.alias("bucket_s"), "ts", "value")
        .groupBy("event_type", "bucket_s")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            "event_type",
            F.from_unixtime("bucket_s", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


@query(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY EPOCH(ts)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS rolling_1h_sum,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY EPOCH(ts)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS rolling_1h_n
    FROM events
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based sliding window frame (RANGE BETWEEN 1 HOUR PRECEDING):
    per-user rolling 1-hour sum/count at every event — the frame bound is
    event-time distance, not row count, so bursts widen the frame and quiet
    periods shrink it (rowsBetween cannot express this). Implemented as a
    rangeBetween frame over fractional epoch seconds — identical numeric
    frame in both engines. One shuffle on user_id; the frame evaluation is
    a per-partition ordered scan with a sliding aggregate, O(n) per user."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round(F.sum("value").over(w), 2).alias("rolling_1h_sum"),
        F.count("*").over(w).alias("rolling_1h_n"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event, n AS mode_n FROM (
        SELECT user_id, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rk
        FROM counts) t
    WHERE rk = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (each user's most frequent event type,
    ties broken alphabetically): two-level aggregation — count per
    (user, type), then argmax per user. Both levels are map-side-partial
    hash aggregates on the SAME user_id-prefixed key, so the second level
    reuses the first's partitioning; the argmax window input is one row per
    (user, type) — 5 rows per user here — never the raw events. (Spark's
    builtin `mode` breaks ties nondeterministically, so the explicit
    argmax with a tie-break is also the determinism-correct formulation.)"""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), F.col("n").alias("mode_n"))
    )


@query(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_qty,
           ROUND(VAR_SAMP(l_discount), 6) AS var_disc,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, stddev, variance — one aggregation pass. All four are
    algebraic aggregates with constant-size mergeable state (sum, sum-of-
    squares, sum-of-products, count), so map-side partials reduce the
    shuffle to one state tuple per (group, task) no matter the input size —
    same scale envelope as plain SUM. Results rounded in both engines
    (aggregate-float rule); the moments accumulate in the same IEEE doubles
    either side."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.count("*").alias("n"),
    )
