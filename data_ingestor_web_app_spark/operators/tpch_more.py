"""Third TPC-H wave over the fixture schema: Q7 (volume shipping between two
nations), Q8 (national market share), Q13 (customer order-count
distribution), Q15 (top supplier by quarterly revenue). Q2/Q9/Q11/Q16/Q20
need partsupp and Q21 needs l_receiptdate/l_commitdate — columns the driver
fixtures lack — so those shapes are out of reach, not skipped silently.

Reference parity: the reference engine (reference/main.go) has no SQL
surface; these queries generalize its ingest-then-report capability the
same way tpch.py / tpch_extra.py do (SURVEY.md §2C widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — volume shipping: revenue between two nations by direction/year.

    Plan shape for 100 TB: both nation dims broadcast; supplier joined to
    its (2-nation-pruned) dim by broadcast so lineitem is filtered to ~2/25
    of suppliers before any shuffle. The disjunctive nation-pair predicate
    is applied AFTER the cust/supp nation names are attached — it needs
    both sides, so it can't push below the orders⋈customer shuffle, but
    customer is pre-pruned to the same two nations, which prunes orders via
    the join. Two big shuffles (l_orderkey, o_custkey); final agg is 2×2×N
    years — map-side partials collapse it."""
    two = (F.col("n_name") == "NATION_3") | (F.col("n_name") == "NATION_7")
    nat = table(spark, sf_dir, "nation").where(two).select("n_nationkey", "n_name")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair_ok = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair_ok)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_1'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — national market share: NATION_1's share of AMERICA-customer
    ECONOMY-part revenue per order year.

    Plan shape for 100 TB: part is filtered to one p_type then broadcast —
    lineitem shrinks ~6× at the scan-adjacent join before any shuffle.
    supplier⋈nation(n2) is a broadcast that only ATTACHES supp nation (no
    filtering — every nation participates in the denominator). customer is
    pruned to AMERICA nations via the folded region⋈nation broadcast dim.
    Shuffles: l_orderkey (meet orders) and o_custkey (meet customer); the
    share is a conditional-sum / sum over the same rows — one aggregation,
    no second pass."""
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select("s_suppkey", "supp_nation")
    )
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(F.round(F.sum(nat_vol) / F.sum(vol), 4).alias("mkt_share"))
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey,
               COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — customer order-count distribution (spec's o_comment NOT LIKE
    filter dropped: fixtures carry no comment column; the interesting
    two-level-aggregate-over-outer-join shape is intact).

    Plan shape for 100 TB: orders is pre-aggregated to (o_custkey, cnt)
    BEFORE meeting customer — map-side partial count collapses the fact
    table to one row per customer, so the left join moves |customer| rows,
    not |orders|. Customers with zero orders survive via the left join +
    coalesce(0). The outer distribution agg groups on c_count (~tens of
    distinct values) — partials collapse it to nothing."""
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
    )
    return (
        table(spark, sf_dir, "customer")
        .select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — top supplier(s) by quarterly revenue (ties kept, per spec).

    Plan shape for 100 TB: lineitem aggregates to one row per supplier
    (map-side partials; one shuffle on l_suppkey). The scalar MAX over that
    per-supplier frame is a single-row aggregate broadcast back as a cross
    join — O(#suppliers) input, 1-row broadcast, never a global sort. The
    winner set (usually 1 row) then broadcast-joins supplier for the name.
    Both engines compare against the ROUNDED revenue so the max-equality
    predicate sees identical values cross-engine."""
    rev = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    winners = rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev")).select(
        "supplier_no", "total_revenue"
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(winners), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
