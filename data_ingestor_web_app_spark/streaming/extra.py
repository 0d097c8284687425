"""Wave-15 streaming addition: windowed top-k composed with batch rank.

Registered at the back of the registry (the front-of-list streaming
module order is load-bearing for the driver's correctness window — see
registry._MODULES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.registry import query
from data_ingestor_web_app_spark.streaming import runtime

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "stream_windowed_topk",
    oracle="""
    WITH counts AS (
        SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT win_start, event_type, n, rk FROM (
        SELECT win_start, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY win_start
                                  ORDER BY n DESC, event_type) AS rk
        FROM counts) t
    WHERE rk <= 2
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 event types per 1-hour window, computed the way production
    actually does it: the STREAM maintains the windowed counts (incremental
    state, complete-mode memory table here; append+watermark+parquet in
    prod), and the RANKING runs as a cheap batch query over the sink table
    — streaming keeps state additive/mergeable, ranking stays out of the
    hot path.

    Scale shape: streaming side is the same keyed-state aggregation as
    stream_tumbling (state = windows x types, bounded by watermark
    eviction); the batch rank partitions by window with the rn<=k
    group-limit pushdown over a table that is already tiny (one row per
    window x type, not per event)."""
    s = runtime.events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("win_start"),
            "event_type",
            "n",
        )
    )
    final = runtime.run_to_memory(agg, "complete")
    w = Window.partitionBy("win_start").orderBy(F.col("n").desc(), F.col("event_type"))
    return final.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 2)
