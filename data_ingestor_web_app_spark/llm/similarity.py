"""Similarity search over the embeddings table (north-star addition).

Brute-force cosine top-k is the correctness baseline (and the oracle);
the LSH-bucketed variant is the 100 TB path — candidates come from a
bucket join instead of an all-pairs product.

All vector math is built-in higher-order functions on ArrayType
(zip_with/aggregate/transform) — JVM-side, no Python, no UDF. Floats are
cast to double BEFORE any arithmetic so Spark and DuckDB accumulate
identically-typed sums; cosines are rounded to 6 places, far above the
~1e-15 accumulation-order noise, so the hash check is stable.

Grounding (PAPERS.md): distributed top-k similarity structure follows the
filter-and-refine designs of "Incremental ... Top-K Similarity Search"
(EDBT 2020) and REPOSE (ICDE 2021) — cheap bucketing/candidate pruning
first (LSH buckets / IVF posting lists), exact re-rank on survivors.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.llm.vector_common import (
    SIM_COSINE_TOPK_ORACLE,
    ORACLE_DOT as _ORACLE_DOT,
    ann_bucket_ctes as _ann_bucket_ctes,
    best_centroid as _best_centroid,
    bucket_from_micro_dots as _bucket_from_micro_dots,
    centroid_dots_sorted as _centroid_dots_sorted,
    codebook_row as _codebook_row,
    dot as _dot,
    hyperplanes as _hyperplanes,
    micro_dots_all as _micro_dots_all,
    norm as _norm,
    plane_micro_dot as _plane_micro_dot,
)
from data_ingestor_web_app_spark.registry import query


@query("sim_cosine_topk", oracle=SIM_COSINE_TOPK_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for each query vector (vec_id < 20), brute
    force: broadcast the (tiny) query side against the full corpus, dot/norm
    via zip_with + aggregate, per-query top-k via window with the rn<=k
    group-limit pushdown.

    Scale: the corpus side never shuffles for the join (queries broadcast);
    top-k is per-query state of size k. For corpus×corpus at 100 TB use
    sim_ann_lsh."""
    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    q = base.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    cos = F.round(_dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("nrm")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        pairs.select("qid", F.col("vec_id").alias("nid"), cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
    )


@query(
    "sim_pairwise_threshold",
    oracle="""
    WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
    ue AS (SELECT vec_id, UNNEST(embedding) AS x,
                  GENERATE_SUBSCRIPTS(embedding, 1) AS i FROM sub),
    norms AS (SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
              FROM ue GROUP BY vec_id),
    dots AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                    SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
             FROM ue a JOIN ue b ON a.i = b.i AND a.vec_id < b.vec_id
             GROUP BY a.vec_id, b.vec_id)
    SELECT d.va, d.vb, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots d
    JOIN norms na ON na.vec_id = d.va
    JOIN norms nb ON nb.vec_id = d.vb
    WHERE d.dot / (na.nrm * nb.nrm) >= 0.3
    """,
)
def sim_pairwise_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine >= 0.3 within a bounded subset (vec_id < 200;
    the corpus has no clusters — measured max pairwise cosine ~0.4, so 0.3
    yields a small true-pair set). The subset bound is the point: explicit
    all-pairs must always be bounded; unbounded pair generation goes through
    LSH buckets (sim_ann_lsh)."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    base = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    a = base.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = base.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    raw_cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("va") < F.col("vb"))
        .withColumn("raw_cos", raw_cos)
        .where(F.col("raw_cos") >= 0.3)
        .select("va", "vb", F.round(F.col("raw_cos"), 6).alias("cosine"))
    )


_N_PLANES = 12  # 2^12 buckets; planes live in vector_common (shared, no-registration)


_ANN_LSH_ORACLE = f"""
    WITH {_ann_bucket_ctes()},
    cand AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid
        FROM bits a JOIN bits b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    dots AS (
        SELECT cd.qid, cd.nid, SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot
        FROM cand cd
        JOIN ex a ON a.vec_id = cd.qid
        JOIN ex b ON b.vec_id = cd.nid AND b.i = a.i
        GROUP BY cd.qid, cd.nid
    ),
    cos AS (
        SELECT d.qid, d.nid, ROUND(d.dot / (nq.nrm * nn.nrm), 6) AS cosine
        FROM dots d
        JOIN norms nq ON nq.vec_id = d.qid
        JOIN norms nn ON nn.vec_id = d.nid
    )
    SELECT qid, nid, cosine, rk FROM (
        SELECT qid, nid, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rk
        FROM cos) t
    WHERE rk <= 3
    """


@query("sim_ann_lsh", oracle=_ANN_LSH_ORACLE)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH (SimHash for
    cosine): bucket = sign-bits of 12 fixed projections; candidates share a
    bucket; exact cosine re-rank inside the bucket; top-3 per query.

    The projections are literal arrays in the plan (deterministic seed), the
    bucket join replaces the all-pairs product: at 100 TB each bucket holds
    ~N/4096 vectors and the join is bucket-co-partitioned. Multi-probe
    (flipping low-margin bits) would raise recall; tests measure recall
    against sim_cosine_topk instead of asserting exact equality."""
    e = table(spark, sf_dir, "embeddings")
    # integer micro-dot projections: sign test is order-independent, so the
    # DuckDB oracle's unordered SUM can never flip a bucket bit (r5 ADVICE).
    # r11: all 12 projections come from ONE literal plane matrix + fold
    # (vector_common.micro_dots_all) — the old 12 separate folds made the
    # expression tree so large that Catalyst planning dominated the query.
    base = e.select(
        "vec_id",
        "embedding",
        _micro_dots_all("embedding").alias("pd"),
        _norm(F.col("embedding")).alias("nrm"),
    ).select(
        "vec_id",
        "embedding",
        _bucket_from_micro_dots(F.col("pd")).alias("bucket"),
        "nrm",
    )
    a = base.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("nrm").alias("qn"), "bucket")
    b = base.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"), F.col("nrm").alias("nn"), "bucket")
    cand = a.join(b, ["bucket"]).where(F.col("qid") != F.col("nid"))
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        cand.select("qid", "nid", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


def _centroids(e: DataFrame) -> DataFrame:
    """K centroids as (c_label, centroid array): per-label means — the
    coarse-quantizer codebook (stand-in for k-means iterations, same plan
    shape). Tiny (K x dim): always broadcast."""
    ue = e.select("label", F.posexplode(F.col("embedding")).alias("i", "x"))
    return (
        ue.groupBy("label", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select(
            F.col("label").alias("c_label"),
            F.transform("pairs", lambda p: p.cx).alias("centroid"),
        )
    )


@query(
    "sim_ivf_assign",
    oracle="""
    WITH ue AS (
        SELECT vec_id, label, UNNEST(embedding) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS i
        FROM embeddings
    ),
    centroids AS (
        SELECT label AS c_label, i, AVG(CAST(x AS DOUBLE)) AS cx
        FROM ue GROUP BY label, i
    ),
    dots AS (
        SELECT u.vec_id, u.label, c.c_label,
               SUM(CAST(u.x AS DOUBLE) * c.cx) AS dot
        FROM ue u JOIN centroids c ON u.i = c.i
        GROUP BY u.vec_id, u.label, c.c_label
    ),
    ranked AS (
        SELECT vec_id, label, c_label, ROUND(dot, 6) AS dot_r,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ROUND(dot, 6) DESC, c_label) AS rk
        FROM dots
    )
    SELECT vec_id, label, c_label AS assigned_centroid, dot_r AS centroid_dot
    FROM ranked WHERE rk = 1
    """,
)
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization — the build step of inverted-file ANN:
    K centroids (per-label means — a stand-in for k-means iterations, same
    plan shape), every vector assigned to its best centroid by dot product.

    Scale shape: centroids are tiny (K x dim) and BROADCAST; the corpus is
    scanned once; assignment is a per-row argmax — no shuffle of the
    corpus. The posting lists (`assigned_centroid`) then bucket the ANN
    search to corpus/K candidates per query.

    r11 (guide §2.4): the argmax is a per-row fold over the attached
    codebook array instead of the old K-way crossJoin + row_number()
    window — the window hash-partitioned N*K rows by vec_id (a full
    corpus shuffle) to pick each row's own maximum. Same decision rule
    (6dp-rounded dot DESC, c_label ASC), so assignments are identical;
    the Exchange+Sort+Window drop out of the plan."""
    e = table(spark, sf_dir, "embeddings")
    cent = _centroids(e)
    best = _best_centroid("embedding")
    return e.crossJoin(_codebook_row(cent)).select(
        "vec_id",
        "label",
        best["c_label"].alias("assigned_centroid"),
        best["dot"].alias("centroid_dot"),
    )


@query(
    "sim_ivf_topk",
    oracle="""
    WITH ue AS (
        SELECT vec_id, label, UNNEST(embedding) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS i
        FROM embeddings
    ),
    centroids AS (
        SELECT label AS c_label, i, AVG(CAST(x AS DOUBLE)) AS cx
        FROM ue GROUP BY label, i
    ),
    cdots AS (
        SELECT u.vec_id, c.c_label, SUM(CAST(u.x AS DOUBLE) * c.cx) AS dot
        FROM ue u JOIN centroids c ON u.i = c.i
        GROUP BY u.vec_id, c.c_label
    ),
    assign AS (
        SELECT vec_id, c_label FROM (
            SELECT vec_id, c_label,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY ROUND(dot, 6) DESC, c_label) AS rk
            FROM cdots) t WHERE rk = 1
    ),
    probe AS (
        SELECT vec_id AS qid, c_label FROM (
            SELECT vec_id, c_label,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY ROUND(dot, 6) DESC, c_label) AS rk
            FROM cdots WHERE vec_id < 20) t WHERE rk <= 2
    ),
    cand AS (
        SELECT p.qid, a.vec_id AS nid
        FROM probe p JOIN assign a ON a.c_label = p.c_label AND a.vec_id <> p.qid
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
        FROM ue GROUP BY vec_id
    ),
    pdots AS (
        SELECT c.qid, c.nid, SUM(CAST(qa.x AS DOUBLE) * CAST(nb.x AS DOUBLE)) AS dot
        FROM cand c
        JOIN ue qa ON qa.vec_id = c.qid
        JOIN ue nb ON nb.vec_id = c.nid AND nb.i = qa.i
        GROUP BY c.qid, c.nid
    ),
    cos AS (
        SELECT d.qid, d.nid, ROUND(d.dot / (nq.nrm * nn.nrm), 6) AS cosine
        FROM pdots d
        JOIN norms nq ON nq.vec_id = d.qid
        JOIN norms nn ON nn.vec_id = d.nid
    )
    SELECT qid, nid, cosine, rk FROM (
        SELECT qid, nid, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rk
        FROM cos) t WHERE rk <= 5
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search — the scale path composed end-to-end: codebook →
    posting lists → nprobe=2 probe → exact re-rank, all one Catalyst plan.

    1. K broadcast centroids (per-label means, `_centroids`);
    2. every corpus vector lands on ONE posting list (argmax dot — the
       corpus never shuffles: broadcast join + per-row argmax);
    3. each query (vec_id < 20) probes its top-2 centroids;
    4. candidates = posting lists of probed centroids (~2N/K per query
       instead of N) joined on the centroid label;
    5. exact cosine re-rank, top-5 per query.

    Deterministic at every step (dots rounded to 6dp before argmax, label /
    nid tie-breaks), so the whole approximate-search pipeline is
    hash-checked against the analytic oracle — not just rows-counted.
    Recall vs the exact sim_cosine_topk is measured in pytest."""
    e = table(spark, sf_dir, "embeddings")
    # r11 lineage truncation (wave124 idiom): cdots below is referenced by
    # BOTH assign and probe, each reference re-expanding the K-row codebook
    # subtree during analysis; checkpointing K rows is free.
    cent = _centroids(e).localCheckpoint(eager=True)
    # r11 (guide §2.4): per-row sorted centroid-dot array against the
    # broadcast codebook row replaces the old crossJoin-K + row_number()
    # windows — two full N*K corpus shuffles (assign rk=1, probe rk<=2)
    # become per-row folds with the identical (6dp dot DESC, c_label ASC)
    # ranking rule.
    cdots = e.crossJoin(_codebook_row(cent)).select(
        "vec_id", _centroid_dots_sorted("embedding").alias("ds")
    )
    assign = cdots.select("vec_id", F.col("ds")[0]["c_label"].alias("c_label"))
    probe = (
        cdots.where(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("qid"),
            F.explode(F.slice("ds", 1, 2)).alias("d"),
        )
        .select("qid", F.col("d.c_label").alias("c_label"))
    )
    base = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("nrm"))
    corpus = base.join(assign, "vec_id").select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"),
        F.col("nrm").alias("nn"), "c_label",
    )
    queries = base.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), F.col("nrm").alias("qn")
    )
    # broadcast the (query x probed-centroid) side: it is BOUNDED (queries
    # are an explicit small set), and joining on c_label alone has only K
    # distinct keys — a shuffle on it would put 1/K of the corpus on one
    # reducer. With the broadcast the corpus never shuffles at all.
    cand = (
        corpus.join(F.broadcast(probe.join(queries, "qid")), "c_label")
        .where(F.col("nid") != F.col("qid"))
    )
    cos = F.round(_dot(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn")), 6)
    w_rank = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        cand.select("qid", "nid", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_rank))
        .where(F.col("rk") <= 5)
    )
