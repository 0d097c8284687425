"""Recursive / iterative query shapes (Spark 4.1 WITH RECURSIVE).

Spark 4 added ANSI recursive CTEs (SPARK-24497); DuckDB has them natively,
so hierarchy walks are oracle-able SQL-to-SQL — a capability class the
reference engine (reference/main.go, ingest-only) has no surface for.

Reference parity: SURVEY.md §2C widening (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk(c_custkey, anc, depth) AS (
        SELECT c_custkey, c_custkey, 0
        FROM customer WHERE c_custkey < 2000
        UNION ALL
        SELECT c_custkey, anc // 10, depth + 1
        FROM walk WHERE anc >= 10
    )
    SELECT c_custkey,
           MIN(anc) AS root,
           MAX(depth) AS depth
    FROM walk
    GROUP BY c_custkey
    """,
)
def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy walk via recursive CTE: each customer key climbs a synthetic
    decimal org-tree (parent = key DIV 10) to its single-digit root,
    reporting root and depth — the classic parts-explosion / org-rollup
    shape that plain SQL windows cannot express.

    Execution model at 100 TB: each recursion step is one distributed
    UnionLoop iteration — the frontier is a DataFrame, so a step is a
    narrow projection + filter over the previous frontier (no shuffle at
    all here; a graph edge-join variant would shuffle per step). Depth is
    bounded by key width (≤4 here), so the loop terminates in 4 cheap
    iterations regardless of row count. The final per-key agg shuffles
    once on c_custkey.

    The frontier filter (anc >= 10) reaches the recursive scan, so dead
    branches exit the loop early instead of carrying null work forward."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("rec_customer_src")
    return spark.sql(
        """
        WITH RECURSIVE walk(c_custkey, anc, depth) AS (
            SELECT c_custkey, c_custkey, 0
            FROM rec_customer_src WHERE c_custkey < 2000
            UNION ALL
            SELECT c_custkey, anc DIV 10, depth + 1
            FROM walk WHERE anc >= 10
        )
        SELECT c_custkey,
               MIN(anc) AS root,
               MAX(depth) AS depth
        FROM walk
        GROUP BY c_custkey
        """
    )


@query(
    "recursive_graph_paths",
    oracle="""
    WITH RECURSIVE hop(start_nation, cur_region, hops) AS (
        SELECT n_nationkey, n_regionkey, 1
        FROM nation
        UNION ALL
        SELECT h.start_nation, n.n_regionkey, h.hops + 1
        FROM hop h
        JOIN nation n ON n.n_nationkey = h.cur_region
        WHERE h.hops < 3
    )
    SELECT start_nation, cur_region, hops
    FROM hop
    """,
)
def recursive_graph_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth path enumeration over the nation→region edge set
    (nationkey→regionkey, re-entering region keys as nation keys forms a
    small directed graph) — the reachability / BFS-frontier shape.

    Execution model at 100 TB: each iteration joins the FRONTIER (not the
    accumulated result) against the edge table — at cluster scale the edge
    side is either broadcast (dimension-sized, as here) or pre-partitioned
    by key so every hop is a co-located shuffle join. The hops < 3 bound
    caps the loop; unbounded closures instead converge when the frontier
    empties (cycle-guarded by dedup against visited, the standard BFS
    refinement)."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("rec_nation_src")
    return spark.sql(
        """
        WITH RECURSIVE hop(start_nation, cur_region, hops) AS (
            SELECT n_nationkey, n_regionkey, 1
            FROM rec_nation_src
            UNION ALL
            SELECT h.start_nation, n.n_regionkey, h.hops + 1
            FROM hop h
            JOIN rec_nation_src n ON n.n_nationkey = h.cur_region
            WHERE h.hops < 3
        )
        SELECT start_nation, cur_region, hops
        FROM hop
        """
    )
