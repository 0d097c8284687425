"""Wave-17: corpus Zipf diagnostics, HLL sketch rollups, DAU/WAU.

agg_hll_union_rollup is the approximate twin of agg_bitmap_distinct: the
same store-partials-then-merge shape, with fixed-size HLL sketches
instead of exact bitmaps — the trade every metrics warehouse offers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
        SELECT LOWER(UNNEST(STRING_SPLIT(text, ' '))) AS token FROM documents
    ),
    counts AS (
        SELECT token, COUNT(*) AS n FROM toks WHERE token <> ''
        GROUP BY token ORDER BY n DESC, token LIMIT 100
    ),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk
        FROM counts
    )
    SELECT COUNT(*) AS n_terms,
           ROUND(REGR_SLOPE(LN(n), LN(rk)), 6) AS zipf_slope,
           ROUND(REGR_INTERCEPT(LN(n), LN(rk)), 6) AS zipf_intercept,
           ROUND(REGR_R2(LN(n), LN(rk)), 6) AS r2
    FROM ranked
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-100 token frequencies: OLS slope of
    ln(freq) on ln(rank) — natural corpora fit ≈ −1; a flat slope or low
    R² flags synthetic/templated text, making this a one-row corpus
    health check (Piantadosi 2014, public).

    Scale shape: token counts are one map-side-combined shuffle; top-100
    is TakeOrderedAndProject (per-partition heaps); the regression runs
    on 100 rows via the SQL-standard REGR_* aggregates — the same
    rank-bounded pattern as text_tokenize_wordcount, composed with
    agg_linreg's estimator."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("raw"))
        .select(F.lower("raw").alias("token"))
        .where(F.col("token") != "")
    )
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(100)
    )
    from pyspark.sql import Window

    rk = F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("token")))
    ranked = top.select("n", rk.alias("rk"))  # window input bounded at 100 rows
    lnn, lnr = F.log(F.col("n").cast("double")), F.log(F.col("rk").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(lnn, lnr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lnn, lnr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lnn, lnr), 6).alias("r2"),
    )


@query(
    "agg_hll_union_rollup",
    oracle="""
    SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS d,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS approx_within_5pct
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL' AS d,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS approx_within_5pct
    FROM events
    """,
)
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-user rollup from MERGEABLE HLL sketches: one
    sketch per day (hll_sketch_agg over raw events), then the month total
    by UNIONING THE DAY SKETCHES (hll_union_agg) — raw data is touched
    once, exactly like agg_bitmap_distinct, but state is a fixed ~1 KB
    per day regardless of cardinality.

    Promoted from rows-only to hash-exact in r6 (the agg_approx_distinct
    pattern): sketch estimate bytes are engine-specific, so the checked
    output carries the exact per-day/ALL distinct counts plus the ±5%
    bound flag for each day estimate AND the month-level sketch UNION —
    the union bound certifies mergeability, which is the point of the op.

    Scale: THE pattern for distinct-count dashboards at 100 TB — store
    day sketches in the metrics table; any date-range query unions a few
    KB instead of rescanning events. Exactness on demand = the bitmap
    twin; sketch size independence from |users| is what HLL buys."""
    e = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"), "user_id"
    )
    day = e.groupBy("d").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_users_exact"),
    )
    daily = day.select(
        "d",
        "n_users_exact",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("n_users_exact"))
            / F.greatest(F.col("n_users_exact"), F.lit(1))
            <= 0.05
        ).alias("approx_within_5pct"),
    )
    g = e.agg(F.count_distinct("user_id").alias("g"))
    total = (
        day.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"))
        .crossJoin(F.broadcast(g))
        .select(
            F.lit("ALL").alias("d"),
            F.col("g").cast("long").alias("n_users_exact"),
            (
                F.abs(F.col("union_est") - F.col("g"))
                / F.greatest(F.col("g"), F.lit(1))
                <= 0.05
            ).alias("approx_within_5pct"),
        )
    )
    return daily.unionByName(total)


@query(
    "events_dau_wau_ratio",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d),
    wau AS (
        SELECT days.d, COUNT(DISTINCT du.user_id) AS wau
        FROM days JOIN du
          ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
        GROUP BY days.d
    )
    SELECT STRFTIME(dau.d, '%Y-%m-%d') AS d, dau.dau, wau.wau,
           ROUND(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
)
def events_dau_wau_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day: daily active users over trailing-7-day
    active users — the product-health ratio every growth dashboard leads
    with. The trailing-window distinct cannot ride an ordinary window
    frame (COUNT(DISTINCT) over RANGE is unsupported), so each day joins
    the (day, user) activity table over its 7-day band and re-distincts.

    Scale shape: activity collapses to DISTINCT (day, user) FIRST — the
    band join fans out those collapsed rows 7x, not raw events; both the
    join and the distinct shuffle on bounded keys. At 100 TB the same
    ratio comes from the day-level HLL/bitmap partials above (union 7
    sketches per day) with no fan-out at all — implemented as
    agg_hll_union_rollup / agg_bitmap_distinct."""
    e = table(spark, sf_dir, "events")
    du = e.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    days = du.select("d").distinct().select(F.col("d").alias("day"))
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    wau = (
        days.join(
            du,
            (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.day)
        .select(
            F.date_format(dau.d, "yyyy-MM-dd").alias("d"),
            "dau",
            "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
        )
    )
