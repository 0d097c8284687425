"""Wave-25: information-theoretic diagnostics and batching efficiency.

Entropy/MI complete the engine's statistical family (z, t, chi-square,
moments) with the information-theoretic measures feature-selection and
drift monitors use; the length-bucket and vocabulary-growth operators
are the corpus-side counterparts a training pipeline tracks per crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "events_entropy_profile",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n FROM events
        GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, SUM(n) AS tn FROM c GROUP BY user_id),
    ent AS (
        SELECT c.user_id,
               -SUM((c.n * 1.0 / t.tn) * LN(c.n * 1.0 / t.tn)) AS h,
               COUNT(*) AS n_types
        FROM c JOIN tot t ON t.user_id = c.user_id
        GROUP BY c.user_id
    )
    SELECT n_types,
           COUNT(*) AS n_users,
           ROUND(AVG(h), 6) AS mean_entropy,
           ROUND(MIN(h), 6) AS min_entropy,
           ROUND(MAX(h), 6) AS max_entropy
    FROM ent GROUP BY n_types
    """,
)
def events_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity profile: Shannon entropy of each user's
    event-type distribution (0 = single-action bots, ln|types| = uniform
    explorers), summarized by how many distinct types the user touches —
    the segmentation signal behind bot filtering and engagement scoring.

    Determinism: entropy sums run per user over ≤|types| terms, then only
    AVG/MIN/MAX cross users — rounded at 6dp the accumulation order
    cannot surface. Scale shape: two stacked groupBys on user_id (both
    map-side partial) and a tiny profile rollup."""
    c = table(spark, sf_dir, "events").groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    tot = c.groupBy("user_id").agg(F.sum("n").alias("tn"))
    p = F.col("n") * 1.0 / F.col("tn")
    ent = (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg((-F.sum(p * F.log(p))).alias("h"), F.count("*").alias("n_types"))
    )
    return ent.groupBy("n_types").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("h"), 6).alias("mean_entropy"),
        F.round(F.min("h"), 6).alias("min_entropy"),
        F.round(F.max("h"), 6).alias("max_entropy"),
    )


@query(
    "agg_mutual_info",
    oracle="""
    WITH joint AS (
        SELECT user_id % 2 AS v, event_type AS t, COUNT(*) AS n
        FROM events GROUP BY user_id % 2, event_type
    ),
    nn AS (SELECT SUM(n) AS total FROM joint),
    pv AS (SELECT v, SUM(n) AS nv FROM joint GROUP BY v),
    pt AS (SELECT t, SUM(n) AS nt FROM joint GROUP BY t)
    SELECT ROUND(SUM((j.n * 1.0 / nn.total)
                     * LN((j.n * 1.0 / nn.total)
                          / ((pv.nv * 1.0 / nn.total) * (pt.nt * 1.0 / nn.total)))),
                 6) AS mutual_info_nats,
           COUNT(*) AS n_cells
    FROM joint j
    JOIN pv ON pv.v = j.v
    JOIN pt ON pt.t = j.t
    CROSS JOIN nn
    """,
)
def agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between the hash-split variant and the
    event type — the effect-SIZE companion to agg_chi_square's
    significance test, and the ranking criterion of information-gain
    feature selection. Near zero here: the parity split is independent of
    behavior by construction, which is exactly what an A/A check wants.

    Scale shape: one contingency groupBy with map-side partials;
    marginals re-aggregate the tiny cell table; the MI sum is O(cells)."""
    joint = (
        table(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("v"), F.col("event_type").alias("t"))
        .agg(F.count("*").alias("n"))
    )
    nn = joint.agg(F.sum("n").alias("total"))
    pv = joint.groupBy("v").agg(F.sum("n").alias("nv"))
    pt = joint.groupBy("t").agg(F.sum("n").alias("nt"))
    pxy = F.col("n") * 1.0 / F.col("total")
    px = F.col("nv") * 1.0 / F.col("total")
    py = F.col("nt") * 1.0 / F.col("total")
    return (
        joint.join(F.broadcast(pv), "v")
        .join(F.broadcast(pt), "t")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.round(F.sum(pxy * F.log(pxy / (px * py))), 6).alias("mutual_info_nats"),
            F.count("*").alias("n_cells"),
        )
    )


@query(
    "pipeline_length_buckets",
    oracle="""
    WITH lens AS (
        SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n FROM documents
    ),
    bucketed AS (
        SELECT CAST(CEIL(LN(n) / LN(2)) AS BIGINT) AS bucket, n FROM lens
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           MAX(n) AS max_len,
           CAST(SUM(n) AS BIGINT) AS real_tokens,
           COUNT(*) * MAX(n) AS padded_tokens,
           ROUND(SUM(n) * 1.0 / (COUNT(*) * MAX(n)), 6) AS packing_efficiency
    FROM bucketed GROUP BY bucket
    """,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: documents grouped into power-of-two
    length buckets (the dynamic-batching strategy of every training data
    loader), reporting per-bucket padding efficiency = real tokens /
    (docs × bucket-max) — the number that says how much compute padding
    burns, and the measurement behind choosing bucket boundaries.

    Scale shape: a per-row log2 bucket projection and one
    map-side-combined groupBy over ~log(max_len) buckets."""
    lens = table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).alias("n")
    )
    bucket = F.ceil(F.log(F.col("n").cast("double")) / F.log(F.lit(2.0))).cast("bigint")
    return (
        lens.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n").alias("max_len"),
            F.sum("n").alias("real_tokens"),
            (F.count("*") * F.max("n")).alias("padded_tokens"),
            F.round(
                F.sum("n") * 1.0 / (F.count("*") * F.max("n")), 6
            ).alias("packing_efficiency"),
        )
    )


@query(
    "text_vocab_growth",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    firsts AS (
        SELECT token, MIN(doc_id) AS first_doc FROM toks GROUP BY token
    ),
    deciles AS (
        SELECT UNNEST(RANGE(1, 11)) AS decile,
               (SELECT MAX(doc_id) + 1 FROM documents) AS n_docs
    )
    SELECT d.decile,
           COUNT(CASE WHEN f.first_doc < d.decile * d.n_docs / 10 THEN 1 END)
               AS vocab_size
    FROM deciles d CROSS JOIN firsts f
    GROUP BY d.decile
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct-token count after each
    10% prefix of the corpus (by doc_id order) — natural corpora grow
    vocabulary ~ n^0.5 indefinitely; a curve that flattens (as this
    synthetic fixture's does) flags a closed vocabulary, the companion
    diagnostic to text_zipf_fit.

    Scale shape: the curve needs only each token's FIRST document — one
    groupBy(token) MIN with map-side partials (the token table never
    re-scans per checkpoint); the 10 checkpoints then cross the small
    firsts table. At a natural 10^8-token vocabulary the firsts table is
    the vocabulary itself — still one shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    firsts = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    n_docs = d.agg((F.max("doc_id") + 1).alias("n_docs"))
    deciles = spark.range(1, 11).select(F.col("id").alias("decile"))
    return (
        deciles.crossJoin(F.broadcast(n_docs))
        .crossJoin(firsts)
        .groupBy("decile")
        .agg(
            F.count(
                F.when(
                    F.col("first_doc") < F.col("decile") * F.col("n_docs") / 10, 1
                )
            ).alias("vocab_size")
        )
    )
