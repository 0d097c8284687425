"""Wave-16: weighted quantiles, grid-hash spatial join, epoch ordering.

join_spatial_grid is the standard distributed answer to "find nearby
pairs" when the built-in equi-join can't express a distance predicate:
hash points into fixed grid cells, join only neighboring cells, verify
the exact predicate on candidates — the same bucket-then-verify shape as
the engine's LSH dedup and interval joins, applied to 2-D geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "agg_weighted_percentile",
    oracle="""
    WITH pts AS (
        SELECT event_type, value, CAST(1 + user_id % 5 AS DOUBLE) AS wt
        FROM events
    ),
    ranked AS (
        SELECT event_type, value, wt,
               SUM(wt) OVER (PARTITION BY event_type
                             ORDER BY value, wt
                             ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(wt) OVER (PARTITION BY event_type) AS total
        FROM pts
    )
    SELECT event_type,
           ROUND(MIN(value), 2) AS weighted_median
    FROM ranked
    WHERE cum >= total / 2
    GROUP BY event_type
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per event type (weight = 1 + user_id%5, a stand-in
    for session importance): sort each group by value, walk the cumulative
    weight, take the first value whose running mass reaches half the total
    — the weighted-quantile definition estimators and fair-billing reports
    use, which plain percentile() cannot express.

    Scale shape: both windows partition by event_type — per-group sorted
    state, never a global sort; the "first at-or-past the threshold" is a
    filter + per-group MIN with map-side partials. At extreme group sizes
    the same statistic drops to a two-pass histogram (bucket counts, then
    walk buckets) with an identical outer plan."""
    pts = table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (1 + F.col("user_id") % 5).cast("double").alias("wt"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    ranked = pts.select(
        "event_type",
        "value",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_tot).alias("total"),
    )
    return (
        ranked.where(F.col("cum") >= F.col("total") / 2)
        .groupBy("event_type")
        .agg(F.round(F.min("value"), 2).alias("weighted_median"))
    )


@query(
    "join_spatial_grid",
    oracle="""
    WITH pts AS (
        SELECT event_id AS pid, value AS x,
               CAST(user_id AS DOUBLE) AS y
        FROM events WHERE event_id < 2000
    )
    SELECT a.pid AS pid_a, b.pid AS pid_b,
           ROUND(SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 6)
               AS dist
    FROM pts a JOIN pts b
      ON a.pid < b.pid
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-join (pairs within radius 2) via GRID HASHING: each point
    lands in one 2x2 cell; every candidate pair must share at least one of
    the 9 cells around one of the points, so points are replicated to
    their 3x3 neighborhood keys, joined ON THE CELL KEY (equi!), verified
    exactly, and deduped by emitting a pair only from the cell that owns
    point A. The oracle is the brute-force quadratic join — identical
    output, different (non-scalable) plan.

    Scale shape: replication factor is a constant 9; the join shuffles on
    cell id, so density skew (hot cells) is ordinary key skew AQE can
    split; candidate verification is per-pair O(1). This is the same
    bucket-then-verify pattern as dedup_minhash_lsh, in geometric space —
    and the plan a geo engine (PostGIS ST_DWithin on a tiled index)
    executes."""
    r = 2.0
    cell = r  # cell size = radius: 3x3 neighborhood guarantees coverage
    pts = (
        table(spark, sf_dir, "events")
        .where(F.col("event_id") < 2000)
        .select(
            F.col("event_id").alias("pid"),
            F.col("value").alias("x"),
            F.col("user_id").cast("double").alias("y"),
        )
        .withColumn("cx", F.floor(F.col("x") / cell))
        .withColumn("cy", F.floor(F.col("y") / cell))
    )
    # side A stays home; side B is replicated to its 3x3 neighborhood, so
    # each true pair co-locates in EXACTLY the cell that owns A
    offsets = F.expr(
        "explode(transform(sequence(0, 8), i -> struct(i div 3 - 1 as dx, i % 3 - 1 as dy)))"
    )
    b = (
        pts.select(
            F.col("pid").alias("pid_b"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            "cx",
            "cy",
            offsets.alias("o"),
        )
        .select(
            "pid_b",
            "bx",
            "by",
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
    )
    d2 = (F.col("x") - F.col("bx")) ** 2 + (F.col("y") - F.col("by")) ** 2
    return (
        pts.join(b, ["cx", "cy"])
        .where((F.col("pid") < F.col("pid_b")) & (d2 <= r * r))
        .select(
            F.col("pid").alias("pid_a"),
            "pid_b",
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
    )


@query(
    "pipeline_epoch_shuffle",
    oracle="""
    WITH ordered AS (
        SELECT doc_id,
               MD5(CAST(doc_id AS VARCHAR) || ':1') AS k1,
               MD5(CAST(doc_id AS VARCHAR) || ':2') AS k2
        FROM documents
    ),
    e1 AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k1) AS pos1 FROM ordered
    ),
    e2 AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k2) AS pos2 FROM ordered
    )
    SELECT e1.doc_id, e1.pos1, e2.pos2
    FROM e1 JOIN e2 ON e2.doc_id = e1.doc_id
    WHERE e1.doc_id < 100
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order: each epoch shuffles the
    corpus by md5(doc_id:epoch) — reproducible across reruns and workers
    (no RNG state to ship), different between epochs, the standard trick
    for restartable data loaders. Emits each document's position in epochs
    1 and 2 (bounded to doc_id < 100 for the compare; positions are
    computed over the WHOLE corpus).

    Scale: the global position is computed DISTRIBUTED-ARGSORT style —
    never a single-partition window: the first hash byte buckets rows into
    256 ordered ranges (a hash prefix IS a range prefix), each bucket
    ranks locally (per-key window), and a 256-row running-total of bucket
    sizes supplies each bucket's global offset. The oracle uses the naive
    global ROW_NUMBER — same answer, plan that wouldn't scale."""

    def epoch_positions(ordered: DataFrame, key: str, out: str) -> DataFrame:
        bucketed = ordered.withColumn("b", F.substring(key, 1, 2))
        wb = Window.partitionBy("b").orderBy(key)
        local = bucketed.select(
            "doc_id", "b", F.row_number().over(wb).alias("local_pos")
        )
        sizes = bucketed.groupBy("b").agg(F.count("*").alias("n"))
        # running offset of lexicographically smaller buckets, via a
        # triangular self-join over the 256-row bucket frame (a global-sort
        # window would move the frame to one partition and trip the
        # WindowExec warning; the join keeps even this tiny step shuffle-
        # uniform and the pattern valid at any bucket count)
        lesser = sizes.select(F.col("b").alias("lb"), F.col("n").alias("ln"))
        offsets = (
            sizes.join(lesser, F.col("lb") < F.col("b"), "left")
            .groupBy("b")
            .agg(F.coalesce(F.sum("ln"), F.lit(0)).alias("off"))
        )
        return local.join(F.broadcast(offsets), "b").select(
            "doc_id", (F.col("off") + F.col("local_pos")).alias(out)
        )

    d = table(spark, sf_dir, "documents").select("doc_id")
    ordered = d.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":1"))).alias("k1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":2"))).alias("k2"),
    )
    e1 = epoch_positions(ordered, "k1", "pos1")
    e2 = epoch_positions(ordered, "k2", "pos2")
    return e1.join(e2, "doc_id").where(F.col("doc_id") < 100)
