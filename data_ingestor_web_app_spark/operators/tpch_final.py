"""Final TPC-H wave — the six shapes whose canonical form needs columns the
driver fixtures lack (``partsupp`` for Q2/Q9/Q11/Q16/Q20, ``l_receiptdate``/
``l_commitdate`` for Q21). Each is ADAPTED, not skipped: the missing supply
fact is derived from ``lineitem`` (unit cost = min l_extendedprice/l_quantity
per (part, supplier); availability = shipped quantity) and Q21's "late
delivery" marker is replaced by ``l_returnflag = 'R'``. The QUERY SHAPES —
correlated scalar-min subquery, global-total HAVING threshold, distinct-count
with NOT-IN exclusion, nested grouped-HAVING semi-join, EXISTS/NOT-EXISTS
over sibling rows — are the real thing; only the source columns differ.

Determinism: threshold comparisons (Q11 HAVING, Q20 HAVING) use
``l_quantity``, which is integer-valued in the fixtures, so the sums are
exact in both engines and no float-boundary row can flip. Q2's unit-cost
equality compares doubles produced by the identical IEEE division in both
engines — no rounding anywhere near a comparison.

Reference parity: the reference engine (reference/main.go) has no SQL
surface; these generalize its ingest-then-report capability (SURVEY.md §2C
widening), completing all 22 TPC-H shapes (Q1 = the flagship agg_groupby).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "tpch_q2",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s.s_acctbal AS acctbal, s.s_name AS supp_name,
           s.n_name AS nation, p.p_partkey AS partkey,
           p.p_name AS part_name, ps.unit_cost AS unit_cost
    FROM part p
    JOIN supply ps ON ps.l_partkey = p.p_partkey
    JOIN eu s ON s.s_suppkey = ps.l_suppkey
    WHERE p.p_size = 25
      AND ps.unit_cost = (
          SELECT MIN(ps2.unit_cost)
          FROM supply ps2
          JOIN eu s2 ON s2.s_suppkey = ps2.l_suppkey
          WHERE ps2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — minimum-cost supplier (adapted: unit cost from lineitem).

    The correlated scalar-min subquery is expressed as a window min over
    the part key — one pass, no self-join re-scan of the supply aggregate.

    Plan shape for 100 TB: the supply aggregate is ONE shuffle on
    (l_partkey, l_suppkey) with map-side partial min; the region-pruned
    supplier dim (~1/5 of suppliers) broadcasts, pruning supply before the
    window; part's p_size filter pushes to the parquet scan and the join
    to (filtered) part prunes again. The window min partitions by
    l_partkey — same key as the aggregate output, so AQE coalesces
    without an extra exchange when partitioning aligns. The double
    equality is safe: both sides are the SAME IEEE value (the min is one
    of the inputs), never a recomputed expression."""
    li = table(spark, sf_dir, "lineitem")
    supply = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size") == 25)
        .select("p_partkey", "p_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        supply.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            "unit_cost",
        )
    )


@query(
    "tpch_q9",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — product-type profit by supplier nation and year (adapted:
    profit = revenue, no partsupp cost to subtract).

    Plan shape for 100 TB: part is filtered by the LIKE before its join —
    broadcast of the pruned part-key set cuts lineitem FIRST, so the only
    big shuffle (l_orderkey ⋈ o_orderkey) carries ~1/6 of lineitem.
    supplier⋈nation broadcasts. Group-by is (25 nations × years) — partial
    aggregation collapses it map-side."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


@query(
    "tpch_q11",
    oracle="""
    WITH nat_parts AS (
        SELECT l_partkey, SUM(l_quantity) AS qty
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_9'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, CAST(qty AS BIGINT) AS stock_qty
    FROM nat_parts
    WHERE qty > (SELECT SUM(qty) * 0.001 FROM nat_parts)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — important stock: parts whose one-nation shipped quantity
    exceeds a fraction of that nation's total (adapted: quantity from
    lineitem instead of partsupp availqty).

    The global-total scalar subquery is a second aggregation over the SAME
    grouped intermediate — the Spark plan caches nothing and still reads
    lineitem once: per-part sums shuffle once, the global total is a
    broadcast-joined single row (crossJoin of a 1-row aggregate, which
    Spark plans as BroadcastNestedLoopJoin — one row, free).

    Determinism: l_quantity is integer-valued, so the per-part and total
    sums are exact in both engines; the 0.001 threshold multiply is one
    IEEE op on an exact integer-valued double — no boundary flakiness."""
    nat = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    total = per_part.agg((F.sum("qty") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("qty") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("qty").cast("long").alias("stock_qty"),
        )
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 — supplier count per part attribute, excluding a complaint list
    (adapted: supplier-part pairs from lineitem, complaint analogue =
    names ending in 7).

    Plan shape for 100 TB: all three part predicates push into the
    broadcast-joined part dim, pruning lineitem before the shuffle; the
    NOT IN is a broadcast anti-join (the exclusion list is a filtered dim,
    bounded). COUNT(DISTINCT) shuffles on the grouping key with the
    supplier key carried — Spark expands it to a two-phase
    partial-distinct aggregate; cardinality per group is ≤ #suppliers."""
    p = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle="""
    SELECT s_name AS supp_name, s_acctbal AS acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_13'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 30
      )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 — suppliers with excess shipments of a part family (adapted:
    shipped quantity threshold instead of partsupp availqty × 0.5).

    The nested grouped-HAVING subquery becomes an aggregate → semi-join:
    lineitem is pruned by the broadcast part-name filter AND the shipdate
    pushdown before its one shuffle on (l_suppkey, l_partkey); the
    surviving supplier keys semi-join the nation-pruned dim. At 100 TB the
    semi-join's left side is the 25×-pruned supplier dim and the right
    side is already aggregated — either direction broadcasts.

    Determinism: HAVING SUM(l_quantity) on integer-valued doubles — exact
    in both engines."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qual = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    nat = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_13")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select(
            F.col("s_name").alias("supp_name"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )


@query(
    "tpch_q21",
    oracle="""
    WITH perorder AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                   THEN l_suppkey END) AS n_fail
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT s_name AS supp_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN perorder po ON po.l_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l1.l_returnflag = 'R'
      AND n.n_name = 'NATION_4'
      AND po.n_supp > 1
      AND po.n_fail = 1
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 — suppliers who kept orders waiting (adapted: the "late" marker
    is l_returnflag='R'; fixtures lack receipt/commit dates).

    The canonical EXISTS ("another supplier contributed") / NOT EXISTS
    ("no OTHER supplier was late") pair is rewritten as ONE per-order
    aggregate: n_supp > 1 covers the EXISTS, and — because the probe row
    itself is late — n_fail = 1 covers the NOT EXISTS (the lone late
    supplier must be the probe's). This replaces two correlated
    re-scans of lineitem with a single map-side-combinable aggregate —
    the rewrite you want at 100 TB, where each correlated EXISTS would be
    its own giant semi/anti join.

    Plan shape: lineitem aggregates once on l_orderkey; the probe side
    (returnflag='R', nation-pruned via broadcast supplier dim) joins it
    and orders on the same l_orderkey — three co-partitioned shuffles on
    one key, then a tiny group-by on s_name."""
    li = table(spark, sf_dir, "lineitem")
    perorder = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail"),
    )
    nat = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    probe = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    return (
        probe.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            perorder.where((F.col("n_supp") > 1) & (F.col("n_fail") == 1)),
            "l_orderkey",
        )
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count("*").alias("numwait"))
    )
