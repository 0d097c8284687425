"""Joins (SURVEY §2B "Joins").

The reference has no joins (single-stream dataflow); this is the generalized
relational surface. Scale posture per query:
- dimension tables (region/nation/supplier/part at TPC-H ratios) are
  broadcast — no shuffle of the fact side;
- fact-fact joins shuffle on the join key and rely on AQE for skew split;
- the as-of join is the windowed formulation (shuffle on the equi key, sort
  within partition) — NOT a cross join, so it survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim equi join: nation (25 rows) and region (5 rows) are
    explicitly broadcast — the customer side never shuffles for the join,
    only for the final aggregation."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


@query(
    "join_shuffle",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_totalprice, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 400000
    """,
)
def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join: both sides shuffle on orderkey; Catalyst picks
    sort-merge (or shuffled-hash under AQE). The o_totalprice filter is pushed
    below the join to shrink the build side first."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    li = table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice", "l_quantity"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join region→nation→customer→orders→lineitem (TPC-H Q5 shape).
    Dims broadcast; the fact table is PRE-AGGREGATED to one row per order
    before entering the join chain (eager aggregation pushdown: at sf0.1
    600k lineitems → 15k order partials, and at 100 TB the join input
    shrinks by the same ~40x line-per-order factor). The partial is
    decomposable (sum/count), so the final per-nation totals are identical
    to joining raw lineitems — the oracle joins raw and hash-matches."""
    r = F.broadcast(table(spark, sf_dir, "region"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li_partial = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("ord_rev"),
            F.count("*").alias("ord_lines"),
        )
    )
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li_partial, li_partial.l_orderkey == o.o_orderkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("ord_rev"), 2).alias("revenue"),
            F.sum("ord_lines").alias("n_lines"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: customers with zero orders survive with count 0."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer with a join-side predicate: every customer appears; order
    columns are NULL unless a big order matches."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > 450000), "right"
    ).select("c_custkey", "o_orderkey", "o_totalprice")


@query(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    ), spend AS (
        SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend
        FROM orders GROUP BY o_custkey
    )
    SELECT COALESCE(b.c_custkey, s.o_custkey) AS custkey,
           b.c_acctbal, s.total_spend
    FROM big_cust b FULL OUTER JOIN spend s ON b.c_custkey = s.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sides with non-overlapping keys on both
    sides (high-balance customers vs customers-with-orders)."""
    c = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    s = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    return c.join(s, c.c_custkey == s.o_custkey, "full").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_acctbal",
        "total_spend",
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: EXISTS without duplicating the left side."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers who never placed a >400k order (plain
    no-orders-at-all is empty at sf0.01 — every customer has orders)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product, small×small only (5 × 3). Anything larger must be
    an LSH/bucketed strategy instead — see llm.similarity."""
    r = table(spark, sf_dir, "region").select("r_name")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


@query(
    "join_theta_range",
    oracle="""
    SELECT c.c_custkey, s.s_suppkey, c.c_acctbal, s.s_acctbal
    FROM customer c JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND ABS(c.c_acctbal - s.s_acctbal) < 500
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) band join with an equi anchor: Spark shuffles on the
    equi key (nationkey) and evaluates the band predicate inside the sorted
    partition — never a full Cartesian."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    return c.join(
        s,
        (c.c_nationkey == s.s_nationkey)
        & (F.abs(c.c_acctbal - s.s_acctbal) < 500),
    ).select("c_custkey", "s_suppkey", "c_acctbal", "s_acctbal")


@query(
    "join_asof",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order at-or-before the event
    per user (events.user_id shares the custkey domain — FIXTURES.md).

    Implementation: equi-join on the key + windowed latest-row selection.
    The join shuffles on user_id only; the window sorts within the partition.
    At 100 TB the conditional join would be bounded with a time-range band
    to cap the intermediate — that variant is implemented as
    ``join_asof_banded`` below; the deterministic tie-break (orderkey DESC)
    keeps the oracle hash stable.
    """
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    joined = e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
    # latest-at-or-before via max(struct(date, key)): partially aggregatable
    # (map-side combine shrinks the shuffle to one row per event), unlike a
    # row_number window which must sort every joined row. Struct ordering =
    # (o_orderdate DESC-equivalent max, then o_orderkey) — same tie-break as
    # the oracle's ROW_NUMBER.
    best = joined.groupBy("event_id", "user_id").agg(
        F.max(F.struct("o_orderdate", "o_orderkey")).alias("best")
    )
    return best.select(
        "event_id",
        "user_id",
        F.col("best.o_orderkey").alias("asof_orderkey"),
        F.date_format("best.o_orderdate", "yyyy-MM-dd").alias("asof_orderdate"),
    )


@query(
    "join_asof_banded",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, p.event_id AS prev_event_id, p.ts AS prev_ts,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY p.ts DESC, p.event_id DESC
               ) AS rn
        FROM events e JOIN events p
          ON p.user_id = e.user_id
         AND p.ts < e.ts
         AND p.ts >= e.ts - INTERVAL 1 HOUR
    )
    SELECT event_id, user_id, prev_event_id,
           STRFTIME(prev_ts, '%Y-%m-%d %H:%M:%S') AS prev_ts_s
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (horizon-capped) as-of join — the 100 TB posture the join_asof
    docstring promises: each event is matched to the latest PRIOR event of
    the same user no older than 1 hour, so the join intermediate is bounded
    by events-per-user-per-hour instead of the user's entire history. The
    band predicate (p.ts BETWEEN e.ts - horizon AND e.ts) is evaluated
    inside the user_id equi-join partition — one shuffle, never Cartesian —
    and the latest-row pick is the same partially-aggregatable
    max(struct(ts, id)) as join_asof. Events with no in-horizon predecessor
    drop out (inner-join semantics, matching the oracle)."""
    e = table(spark, sf_dir, "events")
    p = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = e.join(
        p,
        (p.p_user_id == e.user_id)
        & (p.p_ts < e.ts)
        & (p.p_ts >= e.ts - F.expr("INTERVAL 1 HOUR")),
    )
    best = joined.groupBy("event_id", "user_id").agg(
        F.max(F.struct("p_ts", "p_event_id")).alias("best")
    )
    return best.select(
        "event_id",
        "user_id",
        F.col("best.p_event_id").alias("prev_event_id"),
        F.date_format("best.p_ts", "yyyy-MM-dd HH:mm:ss").alias("prev_ts_s"),
    )
