"""Wave-28: accumulating snapshot, skyline (Pareto front), MAD.

join_accumulating_snapshot is the Kimball accumulating-snapshot fact
(one row per order, milestone columns filled as the lifecycle advances);
agg_pareto_skyline is the classic skyline operator computed without an
all-pairs dominance join; agg_mad completes the robust-statistics family
(winsorized mean, MAD) alongside the exact/approx percentile operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "join_accumulating_snapshot",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               COUNT(*) AS n_lines,
               MIN(CAST(l_shipdate AS DATE)) AS first_ship,
               MAX(CAST(l_shipdate AS DATE)) AS last_ship,
               -- integer micro-cents end-to-end: price/discount are 2dp
               -- values, so cents and basis points are EXACT integers, the
               -- sum is exact, and emitting the INTEGER avoids the 2dp
               -- rounding boundary entirely (sums here land exactly on
               -- x.xx5, where Spark's HALF_UP and libm disagree)
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                   AS BIGINT) AS revenue_micro
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           STRFTIME(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
           STRFTIME(li.first_ship, '%Y-%m-%d') AS first_ship_day,
           STRFTIME(li.last_ship, '%Y-%m-%d') AS last_ship_day,
           DATEDIFF('day', CAST(o.o_orderdate AS DATE), li.last_ship)
               AS days_to_complete,
           li.n_lines, li.revenue_micro
    FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey < 3000
    """,
)
def join_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulating-snapshot fact (Kimball, public): ONE row per order
    carrying its lifecycle milestones — order day, first/last ship day,
    days-to-complete, line count, revenue. The table a warehouse keeps
    up-to-date as each milestone lands, queried here as the equivalent
    batch derivation (bounded to orderkey < 3000 for the compare).

    Scale shape: the lineitem rollup is one map-side-combined
    groupBy(orderkey); the orders join shuffles on the same key —
    co-partitioned if both tables are bucketed by orderkey (the engine's
    join_bucketed_colocated pattern), making the refresh shuffle-free."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
            F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
            # integer micro-cents end-to-end (see oracle comment): exact
            # integer sum, integer output — no float rounding boundary
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("revenue_micro"),
        )
    )
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_day"),
        F.date_format("first_ship", "yyyy-MM-dd").alias("first_ship_day"),
        F.date_format("last_ship", "yyyy-MM-dd").alias("last_ship_day"),
        F.datediff("last_ship", F.col("o_orderdate").cast("date")).alias(
            "days_to_complete"
        ),
        "n_lines",
        "revenue_micro",
    )


@query(
    "agg_pareto_skyline",
    oracle="""
    WITH pts AS (
        SELECT o_orderkey, o_orderpriority,
               o_totalprice, CAST(o_orderdate AS DATE) AS d
        FROM orders
    ),
    lvl AS (
        SELECT o_orderpriority, o_totalprice, MAX(d) AS lvl_max_d
        FROM pts GROUP BY o_orderpriority, o_totalprice
    ),
    swept AS (
        SELECT o_orderpriority, o_totalprice,
               MAX(lvl_max_d) OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_d_above
        FROM lvl
    )
    SELECT p.o_orderpriority,
           COUNT(*) AS skyline_size,
           ROUND(MAX(p.o_totalprice), 2) AS max_price,
           STRFTIME(MAX(p.d), '%Y-%m-%d') AS max_day
    FROM pts p
    JOIN swept s ON s.o_orderpriority = p.o_orderpriority
               AND s.o_totalprice = p.o_totalprice
    WHERE s.best_d_above IS NULL OR p.d >= s.best_d_above
    GROUP BY p.o_orderpriority
    """,
)
def agg_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) per priority class under STRICT dominance:
    an order survives iff no other order in its class has BOTH strictly
    higher price AND a strictly later date. Sort-sweep (Börzsönyi et al.
    2001, public), tie-exact formulation: collapse to distinct price
    LEVELS first (max date per level), sweep levels in descending price
    order — "1 preceding" over distinct levels is exactly the
    strictly-higher-price set — then a point survives iff its date is >=
    the best date among strictly-higher-priced levels (equal dates are
    not dominated; equal prices never dominate each other). Never the
    O(n²) dominance self-join.

    Scale shape: one groupBy to price levels (map-side combined), one
    per-class window over the (far smaller) level set, one shuffle join
    back on (class, price) — all co-partitioned on the class key. A
    global (unpartitioned) skyline would range-partition on price and
    stitch boundary maxima — same algorithm, two passes."""
    pts = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    lvl = pts.groupBy("o_orderpriority", "o_totalprice").agg(F.max("d").alias("lvl_max_d"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = lvl.select(
        "o_orderpriority",
        "o_totalprice",
        F.max("lvl_max_d").over(w).alias("best_d_above"),
    )
    return (
        pts.join(swept, ["o_orderpriority", "o_totalprice"])
        .where(F.col("best_d_above").isNull() | (F.col("d") >= F.col("best_d_above")))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("skyline_size"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("max_day"),
        )
    )


@query(
    "agg_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, QUANTILE_CONT(value, 0.5) AS m
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(MAX(med.m), 4) AS median,
           ROUND(QUANTILE_CONT(ABS(e.value - med.m), 0.5), 4) AS mad,
           ROUND(QUANTILE_CONT(ABS(e.value - med.m), 0.5) * 1.4826, 4)
               AS sigma_robust
    FROM events e JOIN med ON med.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type, with the 1.4826-scaled
    robust sigma (the consistency constant for normal data, public) —
    the outlier-immune spread estimate paired with agg_winsorized_mean's
    outlier-immune location; together they give robust z-scores
    (|x − median| / sigma_robust) that one extreme value cannot poison.

    Scale shape: two percentile passes (group median, then median of
    absolute deviations after re-joining the tiny median frame) — exact
    aggregates here, approx_percentile at extreme group sizes with the
    same two-pass plan."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "m", F.abs(F.col("value") - F.col("m")).alias("ad")
    )
    return dev.groupBy("event_type").agg(
        F.round(F.max("m"), 4).alias("median"),
        F.round(F.expr("percentile(ad, 0.5)"), 4).alias("mad"),
        F.round(F.expr("percentile(ad, 0.5)") * 1.4826, 4).alias("sigma_robust"),
    )
