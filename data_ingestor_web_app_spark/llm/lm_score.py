"""Wave-21: statistical-LM quality scoring, sweep-line concurrency,
embedding cluster diagnostics.

text_bigram_lm_score is the model-based quality filter of a pretraining
pipeline (CCNet's LM-perplexity stage, public) with the language model
replaced by the corpus's OWN bigram statistics — no external weights,
fully oracle-checkable, same plan shape as scoring against a real
n-gram LM table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ),
    flat AS (
        SELECT doc_id, UNNEST(t) AS tok, GENERATE_SUBSCRIPTS(t, 1) AS i
        FROM toks
    ),
    bi AS (
        SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        FROM flat a JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    ),
    bigram_counts AS (
        SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2
    ),
    unigram_counts AS (
        SELECT tok AS w1, COUNT(*) AS c1 FROM flat GROUP BY tok
    ),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM flat),
    scored AS (
        SELECT bi.doc_id,
               -LN((bc.c2 + 1.0) / (uc.c1 + vocab.v)) AS nll
        FROM bi
        JOIN bigram_counts bc ON bc.w1 = bi.w1 AND bc.w2 = bi.w2
        JOIN unigram_counts uc ON uc.w1 = bi.w1
        CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(AVG(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document statistical-LM quality score: train an add-1-smoothed
    bigram model ON the corpus (P(w2|w1) = (c(w1 w2)+1)/(c(w1)+|V|)),
    then score every document by its mean negative log-likelihood — the
    perplexity-filter stage of CCNet-style pipelines, where unusually
    high NLL flags boilerplate/garble and unusually low flags repetition.

    Scale shape: the bigram "model" is one shuffle keyed on (w1, w2) and
    a smaller one on w1 (map-side partials both); scoring re-joins each
    document's bigrams against the model on the same keys — exactly the
    plan for scoring against a real pre-trained n-gram table, which is
    why this stands in faithfully for the production stage. AVG keeps
    per-doc accumulation order-free at 6dp."""
    d = table(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("t"))
    flat = d.select("doc_id", F.posexplode("t").alias("i", "tok"))
    bi = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] as w1, t[i + 1] as w2)) ELSE array() END"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bigram_counts = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    unigram_counts = flat.groupBy(F.col("tok").alias("w1")).agg(
        F.count("*").alias("c1")
    )
    vocab = flat.agg(F.countDistinct("tok").alias("v"))
    nll = -F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        bi.join(bigram_counts, ["w1", "w2"])
        .join(unigram_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
        )
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH sessions AS (
        SELECT user_id, ts AS start_ts, ts + INTERVAL 15 MINUTE AS end_ts,
               CAST(ts AS DATE) AS d
        FROM events
    ),
    deltas AS (
        SELECT d, start_ts AS t, 1 AS delta FROM sessions
        UNION ALL
        SELECT d, end_ts AS t, -1 AS delta FROM sessions
    ),
    swept AS (
        SELECT d,
               SUM(delta) OVER (PARTITION BY d ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS live
        FROM deltas
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS d, CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY d
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day via the sweep-line algorithm: every event
    opens a 15-minute activity interval; +1/−1 deltas at interval edges,
    sorted within each day, running-summed — the max of the running count
    is the day's peak simultaneous activity. This is the reference's
    1,000-connection admission cap (/root/reference/main.go:58,199)
    turned into a measurable: what WAS the peak load.

    Determinism: ties between an opening and a closing edge at the same
    instant order (−1 before +1) via the delta sort key, identical in
    both engines. Scale shape: the sweep partitions by day — per-day
    sorted state, no global ordering; days are uniform keys. Finer
    sharding (hour) drops straight in if a single day's edge list ever
    outgrows a partition."""
    e = table(spark, sf_dir, "events")
    sessions = e.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
        F.col("ts").cast("date").alias("d"),
    )
    deltas = sessions.select(
        "d", F.col("start_ts").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select("d", F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("d")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.select("d", F.sum("delta").over(w).alias("live"))
    return swept.groupBy(F.date_format("d", "yyyy-MM-dd").alias("d")).agg(
        F.max("live").alias("peak_concurrent")
    )


@query(
    "sim_label_centroid_stats",
    oracle="""
    WITH ue AS (
        SELECT label, vec_id, UNNEST(embedding) AS x,
               GENERATE_SUBSCRIPTS(embedding, 1) AS i
        FROM embeddings
    ),
    cent AS (
        SELECT label, i, AVG(CAST(x AS DOUBLE)) AS cx FROM ue GROUP BY label, i
    ),
    dots AS (
        SELECT ue.label, ue.vec_id,
               SUM(CAST(ue.x AS DOUBLE) * cent.cx) AS dot,
               SQRT(SUM(CAST(ue.x AS DOUBLE) * CAST(ue.x AS DOUBLE))) AS nv,
               SQRT(SUM(cent.cx * cent.cx)) AS nc
        FROM ue JOIN cent ON cent.label = ue.label AND cent.i = ue.i
        GROUP BY ue.label, ue.vec_id
    )
    SELECT label,
           COUNT(*) AS n_members,
           ROUND(AVG(dot / (nv * nc)), 6) AS mean_cos_to_centroid,
           ROUND(MIN(dot / (nv * nc)), 6) AS min_cos_to_centroid
    FROM dots GROUP BY label
    """,
)
def sim_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster cohesion diagnostics: per label, the centroid
    (dimension-wise mean) and each member's cosine to it, summarized as
    mean and worst-case cohesion — the quick health check run before
    trusting labels for semantic dedup or stratified sampling (low mean
    cohesion = label is noise).

    Scale shape: centroids are one groupBy(label, dim) with map-side
    partials (|labels| x 64 rows out); members join the broadcast
    centroid on label and reduce to one cosine per vector — the corpus
    shuffles once on label, mirroring sim_ivf_assign's
    broadcast-codebook pattern."""
    e = table(spark, sf_dir, "embeddings")
    ue = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select("label", "vec_id", (F.col("i0") + 1).alias("i"), F.col("xf").cast("double").alias("x"))
    cent = ue.groupBy("label", "i").agg(F.avg("x").alias("cx"))
    dots = (
        ue.join(cent, ["label", "i"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("x") * F.col("cx")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv"),
            F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("nc"),
        )
    )
    cos = F.col("dot") / (F.col("nv") * F.col("nc"))
    return dots.groupBy("label").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg(cos), 6).alias("mean_cos_to_centroid"),
        F.round(F.min(cos), 6).alias("min_cos_to_centroid"),
    )
