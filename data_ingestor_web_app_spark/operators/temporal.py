"""Wave-9 temporal analytics: point-in-time SCD2 joins, last-touch
attribution, and equi-depth histograms.

Generalizes the reference's timestamped-record model
(/root/reference/main.go:86-103 stamps every record with an RFC3339
timestamp) to the time-aware lookups a warehouse needs once history
accumulates: "what did the dimension look like WHEN this fact happened",
"which touchpoint caused this conversion", and "how is the measure
distributed by equal-mass buckets".

Determinism discipline: every top-1-per-group has a unique tie-break
column; money sums round to 2dp in both engines; date comparisons use
CAST-to-DATE on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "join_point_in_time",
    oracle="""
    WITH daily AS (
        SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS valid_from,
               MAX(o_totalprice) AS attr
        FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    ),
    versions AS (
        SELECT custkey, valid_from, attr,
               ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY valid_from)
                   AS version_no,
               LEAD(valid_from) OVER (PARTITION BY custkey ORDER BY valid_from)
                   AS valid_to
        FROM daily
    ),
    probe AS (
        SELECT o.o_custkey AS custkey, CAST(l.l_shipdate AS DATE) AS probe_date,
               l.l_extendedprice * (1 - l.l_discount) AS rev
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT v.version_no,
           COUNT(*) AS n_lines,
           ROUND(SUM(p.rev), 2) AS revenue
    FROM probe p
    JOIN versions v
      ON v.custkey = p.custkey
     AND v.valid_from <= p.probe_date
     AND (v.valid_to IS NULL OR p.probe_date < v.valid_to)
    GROUP BY v.version_no
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against an SCD2-style versioned
    dimension: customer versions are derived from the order feed (one
    version per active day, valid until the next change, open-ended for
    the current one), and every lineitem is joined to the version that was
    valid ON ITS SHIP DATE — the "as the dimension looked then" lookup
    that naive dim joins get wrong. Revenue is rolled up by version
    ordinal to audit how much volume lands on stale versions.

    Scale shape: the version build is one groupBy(custkey, day) plus a
    per-key window (both shuffle on custkey, key-uniform). The temporal
    match is an EQUI join on custkey with the interval predicate applied
    post-join — fan-out is bounded by versions-per-key (small by
    construction), never a range-join explosion; AQE handles key skew.
    The probe side pre-joins orders on orderkey to fetch custkey — at
    100 TB that is the same shuffle the revenue rollup needs anyway."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    daily = (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").cast("date").alias("valid_from"),
        ).agg(F.max("o_totalprice").alias("attr"))
    )
    w = Window.partitionBy("custkey").orderBy("valid_from")
    versions = daily.select(
        "custkey",
        "valid_from",
        "attr",
        F.row_number().over(w).alias("version_no"),
        F.lead("valid_from").over(w).alias("valid_to"),
    )
    probe = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("p_custkey"),
        F.col("l_shipdate").cast("date").alias("probe_date"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    matched = probe.join(
        versions,
        (F.col("custkey") == F.col("p_custkey"))
        & (F.col("valid_from") <= F.col("probe_date"))
        & (F.col("valid_to").isNull() | (F.col("probe_date") < F.col("valid_to"))),
    )
    return matched.groupBy("version_no").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("rev"), 2).alias("revenue"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE event_type IN ('click', 'view')
    ),
    j AS (
        SELECT p.event_id AS pid, p.value, t.event_type AS tt,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY t.ts DESC, t.event_id DESC) AS rn
        FROM p JOIN t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts >= p.ts - INTERVAL 7 DAY
    ),
    best AS (SELECT pid, value, tt FROM j WHERE rn = 1),
    none_p AS (
        SELECT event_id, value FROM p
        WHERE event_id NOT IN (SELECT pid FROM best)
    ),
    all_attr AS (
        SELECT value, tt FROM best
        UNION ALL
        SELECT value, 'none' AS tt FROM none_p
    )
    SELECT tt AS touch,
           COUNT(*) AS n_purchases,
           ROUND(SUM(value), 2) AS sum_value
    FROM all_attr GROUP BY tt
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click/view in the 7 days before it (ties broken by
    event id), or to 'none' when no touchpoint precedes it. Returns
    purchase count and revenue per credited touch type.

    Scale shape: the touch lookup is an equi join on user_id with a
    time-band predicate; the per-purchase winner is a partially
    aggregatable max(struct(ts, event_id, type)) — one row per purchase
    crosses the shuffle, never the full candidate fan-out (map-side
    combine collapses candidates before exchange). The no-touch
    complement is a left_anti on the same shuffle key."""
    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    t = e.where(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("tt"),
    )
    cand = p.join(
        t,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    best = cand.groupBy("pid", "value").agg(
        F.max(F.struct("t_ts", "tid", "tt")).alias("b")
    ).select("pid", "value", F.col("b.tt").alias("tt"))
    none_p = p.join(best.select("pid"), "pid", "left_anti").select(
        "value", F.lit("none").alias("tt")
    )
    all_attr = best.select("value", "tt").unionByName(none_p)
    return all_attr.groupBy(F.col("tt").alias("touch")).agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
    WITH qs AS (
        SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS q FROM events
    )
    SELECT 1 + (value > q[1])::INT + (value > q[2])::INT + (value > q[3])::INT
               AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 2) AS lo,
           ROUND(MAX(value), 2) AS hi,
           ROUND(SUM(value), 2) AS sum_value
    FROM events, qs
    GROUP BY 1
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-mass) histogram of the event measure: exact
    quartile boundaries via the percentile aggregate, then a second pass
    assigns each row 1 + Σ(value > qᵢ) — no global sort anywhere, unlike
    NTILE. Complements the fixed-width `agg_histogram`.

    Scale: pass 1 is a tree-reduced aggregate (exact percentile holds the
    column in memory — at 100 TB swap in approx_percentile, identical
    plan otherwise, boundaries within sketch ε); the boundary row is a
    genuine O(1) broadcast; pass 2 is a plain map-side-combined groupBy
    over 4 buckets. Verified bit-exact against DuckDB's quantile_cont —
    both interpolate a + frac·(b−a) on doubles."""
    e = table(spark, sf_dir, "events")
    qs = e.agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("q")
    )
    bucket = (
        F.lit(1)
        + (F.col("value") > F.col("q")[0]).cast("int")
        + (F.col("value") > F.col("q")[1]).cast("int")
        + (F.col("value") > F.col("q")[2]).cast("int")
    )
    return (
        e.crossJoin(F.broadcast(qs))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
