"""Event-sequence analytics over the events stream table: conversion
funnel and cohort retention — the classic product-analytics shapes a
query engine serving an event pipeline must run at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
