"""Iterative DataFrame algorithms (driver-side loop, distributed steps).

PageRank here is FIXED-POINT INTEGER arithmetic (micro-units of 1e-12), not
float: per-edge contribution floor(rank·85/300) and integer sums are
associative-exact, so the result is identical regardless of aggregation
order — across partitions, across engines, across reruns. Float PageRank
differs in final ulps between any two execution orders, which is exactly
the kind of nondeterminism a 1000-executor job can't debug. Same trick as
sim_rerank_mmr's integer-micro-unit scoring.

Reference parity: SURVEY.md §2C widening (no reference counterpart —
reference/main.go is ingest-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_N = 25  # nation keys 0..24 (fixture invariant, FIXTURES.md)
_TOTAL = 1_000_000_000_000  # 1.0 in micro-units
_INIT = _TOTAL // _N  # uniform start
_BASE = 15 * _TOTAL // (100 * _N)  # (1-d)/N teleport term, d = 0.85


@query(
    "graph_pagerank_unrolled",
    oracle=f"""
    WITH nodes AS (SELECT n_nationkey AS v FROM nation),
    edges AS (
        SELECT v AS src, (v + k) % {_N} AS dst
        FROM nodes CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
    ),
    r0 AS (SELECT v, CAST({_INIT} AS BIGINT) AS rank FROM nodes),
    r1 AS (
        SELECT e.dst AS v, {_BASE} + SUM(r0.rank * 85 // 300) AS rank
        FROM edges e JOIN r0 ON r0.v = e.src GROUP BY e.dst
    ),
    r2 AS (
        SELECT e.dst AS v, {_BASE} + SUM(r1.rank * 85 // 300) AS rank
        FROM edges e JOIN r1 ON r1.v = e.src GROUP BY e.dst
    ),
    r3 AS (
        SELECT e.dst AS v, {_BASE} + SUM(r2.rank * 85 // 300) AS rank
        FROM edges e JOIN r2 ON r2.v = e.src GROUP BY e.dst
    )
    SELECT v, CAST(rank AS BIGINT) AS rank FROM r3
    """,
)
def graph_pagerank_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the circulant graph v → (v+k) mod 25,
    k ∈ {1,2,3}, built from nation keys. The driver loop builds ONE Catalyst
    plan of three chained join+agg stages — iterations are unrolled into the
    logical plan, the distributed analogue of query-compiled iteration.

    Plan shape for 100 TB graphs: each iteration is edges ⋈ ranks on src
    (edges pre-partitioned by src once, ranks re-shuffle each step — or
    broadcast, as here, when ranks fit), then a groupBy(dst) with map-side
    partial sums. Integer micro-unit ranks make those partials exact, so
    AQE can coalesce/reorder freely without changing the answer. For
    convergence-driven (not fixed-k) runs, materialize each iteration with
    a checkpoint to cut lineage growth — documented, not needed at k=3."""
    nodes = table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("v"))
    edges = nodes.select(
        F.col("v").alias("src"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k"),
    ).select("src", ((F.col("src") + F.col("k")) % _N).alias("dst"))
    ranks = nodes.select("v", F.lit(_INIT).cast("long").alias("rank"))
    for _ in range(3):
        contrib = (
            edges.join(F.broadcast(ranks), edges.src == ranks.v)
            .select(F.col("dst"), F.expr("rank * 85 div 300").alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("v"))
            .agg((F.lit(_BASE) + F.sum("c")).alias("rank"))
        )
    return ranks
