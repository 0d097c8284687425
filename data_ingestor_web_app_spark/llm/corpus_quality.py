"""Wave-8 training-corpus operators: repetition signals, eval-set
decontamination, chunk-level exact dedup, full-corpus k-NN graph, and
batch Observation-API metrics.

These generalize the reference's ingest-then-inspect loop
(/root/reference/main.go:86-137 builds LogEntry records;
/root/reference/main.go:259-289 reports running aggregates) to the
corpus-hygiene jobs a 100 TB pretraining pipeline runs between ingest and
tokenization: Gopher-style repetition filters, benchmark decontamination,
sub-document dedup, and neighbor graphs for semantic clustering.

Cross-engine determinism discipline (same as llm/text.py): every ratio is
rounded to 6dp in BOTH engines before any ranking/flag decision; every
top-k has a total order; token split is on a single space in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "text_repetition_ratios",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ),
    flat AS (
        SELECT doc_id, UNNEST(t) AS token, GENERATE_SUBSCRIPTS(t, 1) AS i
        FROM toks
    ),
    tok_stats AS (
        SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT token) AS n_distinct
        FROM flat WHERE token <> '' GROUP BY doc_id
    ),
    grams AS (
        SELECT a.doc_id, a.token || ' ' || b.token AS g
        FROM flat a JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    ),
    gcounts AS (
        SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ),
    gtop AS (
        SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_g
        FROM gcounts GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n_tokens,
           ROUND(1.0 - s.n_distinct * 1.0 / s.n_tokens, 6) AS dup_token_frac,
           ROUND(g.top_c * 1.0 / g.total_g, 6) AS top_bigram_frac,
           (ROUND(1.0 - s.n_distinct * 1.0 / s.n_tokens, 6) > 0.5
            OR ROUND(g.top_c * 1.0 / g.total_g, 6) > 0.18) AS repetitive
    FROM tok_stats s JOIN gtop g ON g.doc_id = s.doc_id
    """,
)
def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, table A1 — public paper): duplicate-token fraction
    (1 - distinct/total) and top-bigram mass fraction, with a `repetitive`
    flag at the published-style thresholds (0.5 / 0.18). Flag is computed
    from the ROUNDED ratios so the decision replays identically in DuckDB.

    Scale shape: one explode + two shuffles both keyed by doc_id (token
    stats, bigram stats) — doc_id is a uniform key, no skew; all
    aggregations have map-side partials. Nothing is corpus-global, so the
    job is embarrassingly parallel over documents at 100 TB."""
    d = table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("t"))
    flat = d.select("doc_id", F.explode("t").alias("token")).where(F.col("token") != "")
    tok_stats = flat.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1])) "
                "ELSE array() END"
            )
        ).alias("g"),
    )
    gcounts = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    gtop = gcounts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_g")
    )
    dup_frac = F.round(F.lit(1.0) - F.col("n_distinct") * 1.0 / F.col("n_tokens"), 6)
    big_frac = F.round(F.col("top_c") * 1.0 / F.col("total_g"), 6)
    return (
        tok_stats.join(gtop, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            dup_frac.alias("dup_token_frac"),
            big_frac.alias("top_bigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("dup_token_frac") > 0.5) | (F.col("top_bigram_frac") > 0.18),
        )
    )


@query(
    "pipeline_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, doc_id % 10 = 0 AS is_eval, STRING_SPLIT(text, ' ') AS t
        FROM documents
    ),
    flat AS (
        SELECT doc_id, is_eval, UNNEST(t) AS token, GENERATE_SUBSCRIPTS(t, 1) AS i
        FROM toks
    ),
    grams AS (
        SELECT a.doc_id, a.is_eval,
               a.token || ' ' || b.token || ' ' || c.token AS g
        FROM flat a
        JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        JOIN flat c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE is_eval),
    contaminated AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE NOT is_eval AND g IN (SELECT g FROM eval_grams)
    )
    SELECT d.source,
           COUNT(*) AS n_train,
           COUNT(c.doc_id) AS n_contaminated,
           COUNT(*) - COUNT(c.doc_id) AS n_kept
    FROM documents d
    LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    WHERE d.doc_id % 10 <> 0
    GROUP BY d.source
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C / Dolma-style, public):
    docs with doc_id % 10 == 0 stand in for the held-out eval set; any
    training doc sharing a 3-gram with any eval doc is dropped. Returns the
    per-source audit (train count, contaminated count, kept count) a
    pipeline run would log.

    Scale shape: grams explode once; the contamination test is a left_semi
    shuffle join on the gram string (NOT a forced broadcast — in this
    fixture the eval side is 10% of the corpus, and even in production the
    safe posture is to let AQE broadcast the eval-gram set only when its
    runtime size says so). The distinct on contaminated doc_ids and the
    final per-source rollup both have map-side partials."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % 10 == 0).alias("is_eval"),
        F.split("text", " ").alias("t"),
    )
    grams = toks.select(
        "doc_id",
        "is_eval",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 3 THEN transform(sequence(0, size(t) - 3), "
                "i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])) ELSE array() END"
            )
        ).alias("g"),
    )
    eval_grams = grams.where("is_eval").select("g").distinct()
    contaminated = (
        grams.where(~F.col("is_eval"))
        .join(eval_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_bad", F.lit(1))
    )
    train = d.where(F.col("doc_id") % 10 != 0).select("doc_id", "source")
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.count("is_bad").alias("n_contaminated"),
            (F.count("*") - F.count("is_bad")).alias("n_kept"),
        )
    )


@query(
    "dedup_chunks",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ),
    flat AS (
        SELECT doc_id, UNNEST(t) AS token, GENERATE_SUBSCRIPTS(t, 1) AS i
        FROM toks
    ),
    chunks AS (
        SELECT doc_id, CAST(FLOOR((i - 1) / 16) AS BIGINT) AS chunk_idx,
               STRING_AGG(token, ' ' ORDER BY i) AS chunk
        FROM flat GROUP BY doc_id, CAST(FLOOR((i - 1) / 16) AS BIGINT)
    ),
    keep AS (
        SELECT chunk, MIN(doc_id * 100000 + chunk_idx) AS keeper
        FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN c.doc_id * 100000 + c.chunk_idx = k.keeper
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM chunks c JOIN keep k ON k.chunk = c.chunk
    GROUP BY c.doc_id
    """,
)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup at 16-token-chunk granularity (the
    paragraph-dedup step of CCNet/Dolma, public): every chunk keeps exactly
    one global occurrence — the lexicographically first (doc_id, chunk_idx).
    Returns per-document chunk count and surviving-chunk count.

    Scale shape: chunking is a per-row transform (no shuffle); the
    keep-decision is ONE shuffle keyed by chunk text with a map-side MIN
    partial; the per-doc rollup shuffles on doc_id. The chunk->keeper map is
    never collected or broadcast — the membership test rides the same
    shuffle join, so nothing is O(corpus) on any single node."""
    d = table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("t"))
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr("sequence(0, cast(ceil(size(t) / 16.0) as bigint) - 1)")
        ).alias("chunk_idx"),
        F.col("t"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.expr("slice(t, chunk_idx * 16 + 1, 16)")).alias("chunk"),
    )
    keep = chunks.groupBy("chunk").agg(
        F.min(F.col("doc_id") * 100000 + F.col("chunk_idx")).alias("keeper")
    )
    return (
        chunks.join(keep, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(
                    F.col("doc_id") * 100000 + F.col("chunk_idx") == F.col("keeper"), 1
                ).otherwise(0)
            ).alias("n_kept"),
        )
    )


@query(
    "sim_knn_graph",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cos AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               ROUND(LIST_COSINE_SIMILARITY(a.v, b.v), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT qid, nid, cosine, rk FROM (
        SELECT qid, nid, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rk
        FROM cos) t
    WHERE rk <= 3
    """,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 cosine neighbor graph over the WHOLE corpus (the
    semantic-dedup / SemDeDup clustering input, public), via BUCKETED
    BLOCK-PAIR GEMM — fully distributed, nothing ever collected to the
    driver. Rows hash to B = ceil(N / block_rows) blocks; each row is
    replicated to every (its-block, other-block) pair tag; applyInPandas
    groups one block pair per task and runs ONE numpy matmul per pair,
    emitting only the per-pair top-3 candidates per query row. A final
    per-qid window merges the B partial top-3 lists — the global top-3 is
    always inside that union, so the result is exact.

    Cost model: shuffle is 2·N·B embedding rows (B ≈ √N at the default
    block size → O(N^1.5) bytes), each task is a (N/B)² ×dim GEMM, and
    only N·B·3 scalar candidates reach the merge window. No task, and no
    single machine, ever holds the whole corpus.

    Determinism: cosines are float64 end-to-end and rounded to 6dp BEFORE
    ranking in both engines; rank ties at 6dp break by neighbor id.

    Scale: exact k-NN is O(N²) by nature — block pairs spread that work
    evenly across the cluster; beyond exact-feasible N the engine's ANN
    path (sim_ann_lsh / sim_ann_multiprobe / sim_ivf_topk) is the
    documented route."""
    return _knn_graph_blocked(spark, sf_dir, block_rows=1024)


def _knn_graph_blocked(spark: SparkSession, sf_dir: str, block_rows: int) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # sizing only: ONE scalar to the driver, never row data
    n = e.count()
    # Two pressures set the block count B (r6 fix for the r5 drift probe —
    # the 1024-row floor alone gave B=2 at n=2000, i.e. 4 GEMM tasks on 32
    # cores, so small corpora ran underparallelized):
    #  - capacity: B >= ceil(n / block_rows) keeps each GEMM tile bounded;
    #  - parallelism: B^2 >= 2 * defaultParallelism keeps every core fed
    #    (B^2 block-pair tasks), without collapsing into kernel-overhead
    #    confetti the way B = sqrt(n) would at small n.
    # The 64 cap bounds replication: shuffle is 2*n*B rows <= 128n.
    par = spark.sparkContext.defaultParallelism
    b_parallel = int(-(-(2 * par) ** 0.5 // 1))
    n_blocks = max(1, min(64, n, max(-(-n // block_rows), b_parallel)))

    blk = (F.col("vec_id") % n_blocks).cast("int")
    tags = F.array(*[F.lit(i) for i in range(n_blocks)])
    # query rows fan out across corpus blocks; corpus rows across query blocks
    qx = e.select(
        blk.alias("qb"),
        F.explode(tags).alias("cb"),
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        F.lit("q").alias("role"),
    )
    cx = e.select(
        F.explode(tags).alias("qb"),
        blk.alias("cb"),
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        F.lit("c").alias("role"),
    )
    both = qx.unionByName(cx)

    cand_schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("nid", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def pair_kernel(pdf):
        qs = pdf[pdf["role"] == "q"]
        cs = pdf[pdf["role"] == "c"].sort_values("id")  # id-asc for tie-break
        if qs.empty or cs.empty:
            return pd.DataFrame({"qid": [], "nid": [], "cosine": []}).astype(
                {"qid": "int64", "nid": "int64", "cosine": "float64"}
            )
        q = np.stack(qs["v"].to_numpy()).astype(np.float64)
        c = np.stack(cs["v"].to_numpy()).astype(np.float64)
        qids = qs["id"].to_numpy(dtype=np.int64)
        cids = cs["id"].to_numpy(dtype=np.int64)
        qn = np.sqrt((q * q).sum(axis=1))
        cn = np.sqrt((c * c).sum(axis=1))
        cosm = np.round((q @ c.T) / np.outer(qn, cn), 6)
        cosm[qids[:, None] == cids[None, :]] = -np.inf  # exclude self
        k = min(3, c.shape[0])
        # stable sort on -cosine over id-ascending corpus → ties break by nid
        idx = np.argsort(-cosm, axis=1, kind="stable")[:, :k]
        cos_top = np.take_along_axis(cosm, idx, axis=1).ravel()
        out = pd.DataFrame(
            {
                "qid": np.repeat(qids, k),
                "nid": cids[idx].ravel(),
                "cosine": cos_top,
            }
        )
        return out[np.isfinite(out["cosine"])]

    # r12: pin the pre-kernel exchange at defaultParallelism — AQE's
    # bytes-based coalescing squeezed the ~8 MB block fan-out shuffle to ~6
    # tasks and serialized the GEMMs; the explicit numPartitions
    # repartition on the grouping keys is exempt from coalescing and
    # satisfies applyInPandas' clustering (no extra exchange).
    cands = (
        both.repartition(par, "qb", "cb")
        .groupBy("qb", "cb")
        .applyInPandas(pair_kernel, schema=cand_schema)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "nid")
    return (
        cands.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 3)
    )


@query(
    "scan_observed_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           MIN(l_orderkey) AS min_key,
           MAX(l_orderkey) AS max_key
    FROM lineitem
    """,
)
def scan_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch Observation API: piggyback dataset-level quality metrics on a
    scan with ``df.observe`` (CollectMetrics operator) instead of a second
    aggregation job — the batch analogue of the reference's running report
    (/root/reference/main.go:259-289) and of streaming
    ``stream_metrics_observe``. The observed row is re-emitted as a 1-row
    DataFrame so the driver can oracle-check the values.

    Scale: CollectMetrics is a zero-shuffle accumulator folded into the
    scan stage — the metrics cost nothing beyond the scan itself, which is
    why production pipelines attach them to every materialization."""
    from pyspark.sql import Observation

    li = table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )
    observed.count()  # one action populates the observation
    m = obs.get
    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_qty", T.DoubleType()),
            T.StructField("sum_price", T.DoubleType()),
            T.StructField("min_key", T.LongType()),
            T.StructField("max_key", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                float(m["sum_qty"]),
                float(m["sum_price"]),
                m["min_key"],
                m["max_key"],
            )
        ],
        schema,
    )
