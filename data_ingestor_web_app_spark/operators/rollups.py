"""Wave-10 mergeable rollups and sequence mining.

The reference keeps ONE running counter pair for its 30-second report
(/root/reference/main.go:259-289). At warehouse scale the same "keep a
summary you can re-aggregate" idea needs MERGEABLE summaries — partials
that combine across partitions, days, and reruns without touching raw
rows again. Bitmap distinct-count is the exact-answer version of that
(HLL sketches in agg_hll_sketch are the approximate one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "agg_bitmap_distinct",
    oracle="""
    WITH daily AS (
        SELECT STRFTIME(ts, '%Y-%m-%d') AS d,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    ),
    total AS (
        SELECT 'ALL' AS d, COUNT(DISTINCT user_id) AS n_users FROM events
    )
    SELECT d, n_users FROM daily
    UNION ALL
    SELECT d, n_users FROM total
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per day AND overall from ONE pass over raw
    data, via Spark 4 bitmap aggregates: each (day, bitmap-bucket) gets a
    bitmap of user-bit-positions (bitmap_construct_agg); per-day counts
    sum bitmap_count over buckets; the overall count ORs the *day-level
    bitmaps* together (bitmap_or_agg) — the rollup re-aggregates partials,
    never the raw events. This is how warehouses make exact COUNT(DISTINCT)
    incremental: store the day bitmaps, OR them for any ad-hoc range.

    Scale shape: raw rows shuffle once on (day, bucket) — a uniform key;
    each bucket bitmap is a fixed 4 KB, so day partials are tiny; the
    month rollup moves only #days × #buckets bitmaps. Compare
    agg_approx_distinct (HLL, fixed-size but approximate) — bitmaps are
    exact and mergeable at the cost of key-space-proportional state."""
    e = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    day_bucket = e.groupBy("d", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    daily = day_bucket.groupBy("d").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    total = (
        day_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_users"))
        .select(F.lit("ALL").alias("d"), "n_users")
    )
    return daily.unionByName(total)


@query(
    "events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT e1 || '>' || e2 || '>' || e3 AS path
        FROM seq WHERE e3 IS NOT NULL
    )
    SELECT path, COUNT(*) AS n FROM paths
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step behavioral paths (the clickstream sequence-mining
    primitive behind funnel discovery): per-user event sequences via two
    LEADs over the (ts, event_id)-ordered timeline, concatenated into a
    path string, counted corpus-wide.

    Scale shape: the window shuffles once on user_id (uniform key) and
    sorts per user — state is one user's timeline, never global; the path
    count is a map-side-combined groupBy; top-10 compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )
