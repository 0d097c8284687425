"""Wave-29: activity streaks, inter-arrival statistics, sparse matmul.

join_sparse_matmul is the relational form of the distributed primitive
underneath PageRank, co-occurrence statistics, and graph propagation:
sparse matrices as (row, col, value) triples, multiplied with one join
and one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "win_streak_days",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grouped AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, COUNT(*) AS len FROM grouped
        GROUP BY user_id, island
    ),
    best AS (
        SELECT user_id, MAX(len) AS longest_streak, COUNT(*) AS n_streaks
        FROM streaks GROUP BY user_id
    )
    SELECT longest_streak,
           COUNT(*) AS n_users,
           ROUND(AVG(n_streaks), 4) AS avg_streaks
    FROM best GROUP BY longest_streak
    """,
)
def win_streak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user via the
    gaps-and-islands date-minus-rank trick (consecutive days share
    `d − row_number`), profiled as a streak-length histogram — the
    engagement metric behind every "N-day streak" product feature.

    Scale shape: distinct (user, day) first (collapses raw events), one
    per-user window over ≤#days rows, two map-side-combined rollups.
    Nothing global."""
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.select(
        "user_id",
        "d",
        F.date_sub("d", F.row_number().over(w)).alias("island"),
    )
    streaks = grouped.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    best = streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"), F.count("*").alias("n_streaks")
    )
    return best.groupBy("longest_streak").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("n_streaks"), 4).alias("avg_streaks"),
    )


@query(
    "events_interarrival_stats",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               DATE_DIFF('microsecond',
                         LAG(ts) OVER (PARTITION BY event_type ORDER BY ts,
                                       event_id),
                         ts) / 1000000.0 AS gap_sec
        FROM events
    )
    SELECT event_type,
           COUNT(gap_sec) AS n_gaps,
           ROUND(AVG(gap_sec), 4) AS mean_gap_sec,
           ROUND(QUANTILE_CONT(gap_sec, 0.5), 4) AS median_gap_sec,
           ROUND(MAX(gap_sec), 4) AS max_gap_sec
    FROM seq WHERE gap_sec IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (mean / median /
    max gap in seconds) — the statistic that sizes stream buffers,
    session-gap thresholds (the reference's 1-second framing gap,
    /root/reference/main.go:66, is exactly such a threshold), and
    anomaly-silence alarms.

    Scale shape: one LAG window partitioned by type ordered by (ts,
    event_id) — per-type sorted state — then a map-side-combined summary;
    microsecond-exact integer differences divide once into seconds so
    both engines round identical doubles."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gap = (
        F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    ).alias("gap_sec")
    seq = e.select("event_type", gap)
    return (
        seq.where(F.col("gap_sec").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_sec").alias("n_gaps"),
            F.round(F.avg("gap_sec"), 4).alias("mean_gap_sec"),
            F.round(F.expr("percentile(gap_sec, 0.5)"), 4).alias("median_gap_sec"),
            F.round(F.max("gap_sec"), 4).alias("max_gap_sec"),
        )
    )


@query(
    "join_sparse_matmul",
    oracle="""
    WITH a AS (
        SELECT user_id AS i, event_type AS j, COUNT(*) AS v
        FROM events GROUP BY user_id, event_type
    ),
    b AS (
        SELECT event_type AS j, STRFTIME(CAST(ts AS DATE), '%w') AS k,
               COUNT(*) AS v
        FROM events GROUP BY event_type, STRFTIME(CAST(ts AS DATE), '%w')
    ),
    c AS (
        SELECT a.i, b.k, SUM(a.v * b.v) AS v
        FROM a JOIN b ON b.j = a.j GROUP BY a.i, b.k
    )
    SELECT i, k, CAST(v AS BIGINT) AS v FROM c WHERE i < 30
    """,
)
def join_sparse_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse matrix multiply as a relational plan: A (user × type
    activity counts) times B (type × day-of-week traffic counts) via the
    classic join-on-inner-dimension + groupBy(outer dims) — the
    distributed primitive under graph propagation, co-occurrence
    statistics, and the engine's own unrolled PageRank. Output bounded to
    i < 30 for the compare; the multiply itself is corpus-wide.

    Scale shape: ONE shuffle on the contraction index j for the join,
    one on (i, k) for the reduction — both with map-side partials; skew
    on a hot j (a dense matrix column) is ordinary join skew, handled by
    AQE or the engine's salting pattern. Integer counts keep the products
    exact — no float accumulation at all."""
    e = table(spark, sf_dir, "events")
    a = e.groupBy(
        F.col("user_id").alias("i"), F.col("event_type").alias("j")
    ).agg(F.count("*").alias("va"))
    b = e.groupBy(
        F.col("event_type").alias("j"),
        (F.dayofweek("ts") - 1).cast("string").alias("k"),
    ).agg(F.count("*").alias("vb"))
    return (
        a.join(b, "j")
        .groupBy("i", "k")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("v"))
        .where(F.col("i") < 30)
    )
