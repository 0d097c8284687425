"""Product quantization (PQ) ANN — wave 12.

Jégou et al. 2011 "Product quantization for nearest neighbor search"
(public): split each vector into m subvectors, k-means each subspace into
a tiny codebook, store each vector as m 1-byte codes, and answer queries
with an asymmetric distance computation (ADC) — a per-subspace lookup
table built once per query, summed per candidate. This is the memory-side
companion to the engine's IVF path (llm/similarity.py): IVF prunes WHICH
vectors to score, PQ shrinks WHAT is stored and scored.

Same determinism discipline as sim_kmeans_iter: centroids are rounded to
6dp at every Lloyd boundary so the whole trajectory is reproducible;
assignment ties break on the lowest centroid id. Registered rows-only
(the unrolled 8-subspace x 2-iteration oracle SQL would be enormous);
pytest asserts Lloyd monotonicity and recall against exact search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_M = 8  # subspaces
_DSUB = 8  # dims per subspace (64 / _M)
# 64 centroids/subspace = 6-bit codes (48 bits/vector). Random gaussian
# fixtures are PQ's worst case (no cluster structure); measured recall@10
# for query 0 at sf0.001: 0.1 with K=16, 0.4 with K=64, 0.2 with K=128
# (128 overfits 500 vectors at ~4 members/centroid). Real embedding
# corpora cluster, where 8-bit codebooks reach production recall.
_K = 64


def _subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, s, sub): one row per vector per subspace, sub = 8 doubles."""
    subs = F.expr(
        f"transform(sequence(0, {_M - 1}), "
        f"s -> slice(embedding, s * {_DSUB} + 1, {_DSUB}))"
    )
    return (
        e.select("vec_id", F.posexplode(subs).alias("s", "sub"))
        .select("vec_id", "s", F.expr("transform(sub, x -> cast(x as double))").alias("sub"))
    )


def _l2sq(a, b):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0d, (acc, v) -> acc + v)")


def _assign(sv: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per (vec_id, s): argmin L2², tie-break lowest cid."""
    j = sv.join(F.broadcast(cent), "s")
    d = _l2sq("sub", "c")
    best = j.groupBy("vec_id", "s").agg(
        F.min(F.struct(d.alias("d"), F.col("cid"), F.col("c"))).alias("b")
    )
    return best.select(
        "vec_id", "s", F.col("b.cid").alias("cid"), F.col("b.d").alias("d")
    )


def _pq_codebook(sv: DataFrame) -> DataFrame:
    """(s, cid, c): _K centroids per subspace after 2 Lloyd iterations from
    a deterministic seed (the subvectors of the _K lowest vec_ids)."""
    cent = (
        sv.where(F.col("vec_id") < _K)
        .select("s", F.col("vec_id").cast("int").alias("cid"), F.col("sub").alias("c"))
    )
    for _ in range(2):
        assigned = _assign(sv, cent).select("vec_id", "s", "cid")
        ue = assigned.join(sv, ["vec_id", "s"]).select(
            "s", "cid", F.posexplode("sub").alias("i", "x")
        )
        cent = (
            ue.groupBy("s", "cid", "i")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
            .groupBy("s", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
            .select("s", "cid", F.expr("transform(pairs, p -> p.cx)").alias("c"))
        )
        # truncate lineage at each Lloyd boundary: the codebook is ~4 KB,
        # but left lazy each iteration DOUBLES the nested join/agg plan and
        # Catalyst's analysis time dominates the actual compute (measured
        # 15.6s -> ~3s at sf0.01). At scale this is "write the codebook
        # checkpoint between iterations" — standard iterative-algorithm
        # hygiene on Spark (same pattern as graph_pagerank_unrolled).
        cent = cent.localCheckpoint(eager=True)
    return cent


@query("sim_pq_adc")  # rows-only: 8-subspace x 2-iteration unrolled oracle SQL
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-10 for query vec_id=0: train the codebook (2 Lloyd
    iterations per subspace), encode the corpus as 8 codes/vector, build
    the query's 8x64 ADC lookup table, and score every candidate as the
    SUM OF 8 TABLE LOOKUPS — no full-dimension math per candidate.

    Scale shape: the codebook is 8x64x8 doubles (4 KB, broadcast); corpus
    encoding is a per-row argmin against the broadcast codebook — scanned,
    never shuffled — and at rest the index is 6 bytes/vector instead of
    256 (42x compression); the ADC table is one query-side row, and
    scoring is a broadcast join + groupBy(vec_id) sum with map-side
    partials. Top-10 compiles to TakeOrderedAndProject. Recall comes from
    the codebook, not the plan — pytest measures it against exact L2."""
    e = table(spark, sf_dir, "embeddings")
    # r11: localCheckpoint instead of cache — sv is referenced ~6 times
    # (2 Lloyd assign/update passes, corpus encoding, query row); cache()
    # deduped execution but every reference still re-analyzed the
    # posexplode subtree. At scale this is "materialize the subvector
    # table once before training", the standard PQ layout.
    sv = _subvectors(e).localCheckpoint(eager=True)
    # the codebook comes back localCheckpoint-truncated from its 2 Lloyd
    # iterations (4 KB leaf) — consumed by corpus encoding + query LUT
    cent = _pq_codebook(sv)
    codes = _assign(sv, cent).select("vec_id", "s", "cid")
    # ADC lookup table for the query: distance from q's subvector to every
    # centroid of the matching subspace
    q = sv.where(F.col("vec_id") == 0).select("s", F.col("sub").alias("qsub"))
    lut = (
        cent.join(F.broadcast(q), "s")
        .select("s", "cid", _l2sq("qsub", "c").alias("dpart"))
    )
    scored = (
        codes.where(F.col("vec_id") != 0)
        .join(F.broadcast(lut), ["s", "cid"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("dpart"), 6).alias("adc_dist"))
    )
    w = Window.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return (
        scored.orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
        .limit(10)
        .withColumn("rk", F.row_number().over(w))
        .select(F.col("vec_id").alias("nid"), "adc_dist", "rk")
    )
