"""Event-sequence analytics over the events stream table: conversion
funnel and cohort retention — the classic product-analytics shapes a
query engine serving an event pipeline must run at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user advances a
    stage only with a LATER event of the next type (strict event-time
    ordering, not mere co-occurrence).

    Scale shape: every stage is a groupBy/join on user_id — one partitioning
    reused across all three stages (Catalyst reuses the exchange instead of
    re-shuffling), so the funnel costs one shuffle of the events table no
    matter how many stages. The stage counts are single-row aggregates
    crossed at the end."""
    e = table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort FROM events
        GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
    )
    SELECT STRFTIME(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(FLOOR(DATEDIFF('day', f.cohort, a.wk) / 7.0) AS BIGINT) AS week_offset,
           COUNT(*) AS n_active
    FROM first_seen f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week, counted
    in every later week they were active. week_offset is whole weeks since
    the cohort week (both sides week-truncated, so the difference is exact).

    Scale shape: two aggregations and one join, ALL keyed on user_id — the
    shuffle partitioning is computed once and reused; the final
    (cohort, offset) rollup is tiny thanks to map-side partials. Cohort
    weeks emit as formatted strings (cross-engine date determinism rule)."""
    e = table(spark, sf_dir, "events")
    first_seen = (
        e.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    )
    activity = e.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "join_salted_skew",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT l_returnflag AS flag,
               'label_' || l_returnflag AS flag_label
        FROM lineitem
    )
    SELECT d.flag_label,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM lineitem l JOIN dim d ON d.flag = l.l_returnflag
    GROUP BY d.flag_label
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join for pathologically skewed keys: lineitem's join
    key (l_returnflag) has only 3 distinct values, so a plain shuffle join
    would put ~1/3 of a 100 TB fact table on ONE reducer. The salt spreads
    each hot key over 16 sub-partitions: the big side gets salt =
    hash(row) % 16, the dim side is replicated 16x (explode over the salt
    range), and the join runs on (key, salt) — answer provably identical to
    the unsalted join (the oracle IS the unsalted join).

    This is the manual twin of AQE's skewedJoin split (which only fires on
    sort-merge joins past size thresholds); salting also composes with
    aggregation pushdown and works when the dim is too big to broadcast."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    dim = (
        li.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .select("flag", F.concat(F.lit("label_"), F.col("flag")).alias("flag_label"))
    )
    n_salt = 16
    big = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_returnflag", "l_quantity"), F.lit(n_salt))
    )
    dim_rep = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return (
        big.join(
            dim_rep,
            (big.l_returnflag == dim_rep.flag) & (big.salt == dim_rep.salt),
        )
        .groupBy("flag_label")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "events_pattern_detect",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_type, value,
               LEAD(event_type) OVER w AS next_type,
               LEAD(ts)         OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           STRFTIME(next_ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
           CAST(FLOOR(EPOCH(next_ts) - EPOCH(ts)) AS BIGINT) AS gap_s
    FROM seq
    WHERE event_type = 'purchase' AND next_type = 'error'
      AND FLOOR(EPOCH(next_ts) - EPOCH(ts)) <= 600
    """,
)
def events_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style event-pattern detection with window navigation:
    a purchase IMMEDIATELY followed (per-user event order) by an error
    within 10 minutes — the complex-event-processing shape (fraud/alert
    rules) without a CEP engine: lead() over a per-user ordered window.

    Scale: one shuffle on user_id, then a linear per-partition scan — the
    same cost envelope as any sessionization; no self-join on time (the
    naive formulation) and no state machine. Longer patterns chain more
    lead() offsets in the same single window pass. Second-resolution gap
    math (epoch seconds) keeps sub-second timestamp precision out of the
    cross-engine comparison."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    # floor of the FRACTIONAL epoch difference — unix_timestamp() truncates
    # each side first, which disagrees with floor(a - b) on sub-second data
    gap_s = F.floor(F.col("next_ts").cast("double") - F.col("ts").cast("double")).cast("long")
    return (
        seq.where(
            (F.col("event_type") == "purchase")
            & (F.col("next_type") == "error")
            & (gap_s <= 600)
        )
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.date_format("next_ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
            gap_s.alias("gap_s"),
        )
    )


@query(
    "events_props_json_agg",
    oracle="""
    SELECT CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE JSON_EXTRACT(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
)
def events_props_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation over the events.props JSON column:
    extract $.k, bucket it, aggregate per bucket — the schema-on-read path
    every event pipeline needs for properties that never made it into
    columns. get_json_object evaluates JVM-side (Jackson) inside codegen;
    at 100 TB the right move is still to materialize hot JSON paths into
    real columns at ingest (this query IS that materialization plan).
    avg uses the round(sum,2)/n pattern (see events_gapfill_locf)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.where(k.isNotNull())
        .groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "agg_histogram",
    oracle="""
    WITH b AS (
        SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bucket
        FROM events WHERE value >= 0 AND value < 100
    )
    SELECT bucket,
           bucket * 5.0 AS lo,
           bucket * 5.0 + 5.0 AS hi,
           COUNT(*) AS n
    FROM b GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (20 buckets of width 5 over [0, 100)):
    bucket index = floor(value/width) — integer arithmetic identical in
    both engines (never width_bucket, which DuckDB lacks). One map-side
    partial aggregation; the shuffle carries at most n_buckets rows per
    task regardless of input size, the textbook distributed-histogram
    bound."""
    e = table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 5.0).cast("long")
    return (
        e.where((F.col("value") >= 0) & (F.col("value") < 100))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 5.0).alias("lo"),
            (F.col("bucket") * 5.0 + 5.0).alias("hi"),
            "n",
        )
    )


@query(
    "events_sessionize",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, value,
               CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marks
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(FLOOR(EPOCH(MAX(ts)) - EPOCH(MIN(ts))) AS BIGINT) AS duration_s,
           ROUND(SUM(value), 2) AS session_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a 30-minute inactivity gap
    starts a new session; session_id is the running count of gap marks —
    lag() to mark boundaries, cumulative sum to number islands, then
    per-session aggregates. The batch twin of stream_session's
    session_window (and of the reference's 1s-idle-gap framing, R3,
    main.go:289-296 — same algorithm, different gap).

    Scale: everything is partitioned by user_id — the lag window, the
    cumulative sum, and the final groupBy all reuse ONE shuffle; per-user
    work is a linear ordered scan. Timestamps in the output go through
    strftime/floor(epoch) (cross-engine date + sub-second rules)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.col("ts").cast("double") - prev_ts.cast("double")) > 1800),
        1,
    ).otherwise(0)
    w_cum = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.select("user_id", "ts", "value", new_session.alias("new_session")).select(
        "user_id", "ts", "value", F.sum("new_session").over(w_cum).alias("session_id")
    )
    return sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.floor(F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double"))).cast("long").alias("duration_s"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH v AS (
        SELECT event_id, user_id, ts,
               CAST(FLOOR(value * 1000) AS BIGINT) AS vi
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, vi,
               COUNT(vi) OVER win AS n,
               SUM(vi)   OVER win AS s,
               SUM(vi * vi) OVER win AS ss
        FROM v
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, vi, CAST(s AS BIGINT) AS s, CAST(ss AS BIGINT) AS ss,
           (20 * vi - s) * (20 * vi - s) > 9 * (20 * ss - s * s) AS is_anomaly
    FROM w
    WHERE n = 20
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag per user: each value vs the mean/stddev
    of its own previous 20 events, flagged when |z| > 3.

    All math is INTEGER (milli-unit values; the flag is the cross-multiplied
    inequality (20·x − s)² > 9·(20·ss − s²), which is |z| > 3 with
    population variance, cleared of divisions) — so partial sums are exact,
    no float summation-order nondeterminism, and the boolean is hash-stable
    cross-engine. The same trick sim_rerank_mmr and graph_pagerank_unrolled
    use: at 1000 executors, float reductions are only reproducible if they
    are not float.

    Plan shape for 100 TB: one shuffle (hash by user_id), per-user sort by
    (ts, event_id), single window pass computing count/sum/sumsq over a
    20-row trailing frame. No global sort; skew bound = hottest user."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_id", "user_id", "ts", F.floor(F.col("value") * 1000).cast("long").alias("vi")
    )
    win = (
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    )
    w = v.select(
        "event_id", "user_id", "vi",
        F.count("vi").over(win).alias("n"),
        F.sum("vi").over(win).alias("s"),
        F.sum(F.col("vi") * F.col("vi")).over(win).alias("ss"),
    ).where(F.col("n") == 20)
    dev = 20 * F.col("vi") - F.col("s")
    return w.select(
        "event_id", "user_id", "vi", "s", "ss",
        (dev * dev > 9 * (20 * F.col("ss") - F.col("s") * F.col("s"))).alias("is_anomaly"),
    )
