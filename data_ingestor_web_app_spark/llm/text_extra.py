"""Round-2 text-analysis additions: TF-IDF term scoring.

Same cross-engine determinism discipline as llm/text.py: scores are
rounded to 6dp in BOTH engines BEFORE ranking, so the per-document top-k
decision replays identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, LOWER(UNNEST(STRING_SPLIT(text, ' '))) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tf),
    scored AS (
        SELECT t.doc_id, t.token,
               ROUND(t.tf * LN(n.n * 1.0 / d.df), 6) AS tfidf
        FROM tf t JOIN df d ON d.token = t.token CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, rk FROM (
        SELECT doc_id, token, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, token) AS rk
        FROM scored) s
    WHERE rk <= 3 AND doc_id < 100
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms: tf = in-document term count, idf =
    ln(N/df) over the WHOLE corpus, score = tf*idf rounded to 6dp before
    ranking (cross-engine rank determinism), token tie-break. Output is
    bounded to doc_id < 100 but the statistics are corpus-global.

    Scale shape: tf is one shuffle on (doc_id, token) with map-side
    partials; df aggregates tf's output by token (re-using its rows, not
    re-scanning text); N is a one-row broadcast; the df join shuffles on
    token — at a natural vocabulary that's the same cardinality as the tf
    table, no skew beyond stopwords, which salting or AQE skew-split
    handles. Ranking is per-document (WindowGroupLimit prunes to 3 during
    the sort)."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("raw"))
        .select("doc_id", F.lower("raw").alias("token"))
        .where(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") <= 3) & (F.col("doc_id") < 100))
    )


@query(
    "text_containment_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, UNNEST(list_distinct(string_split(lower(text), ' '))) AS token
        FROM documents
    ),
    eval_toks AS (
        SELECT doc_id AS eval_id, token FROM toks
        WHERE source = 'src0' AND doc_id < 50
    ),
    eval_sizes AS (
        SELECT eval_id, COUNT(*) AS n_eval FROM eval_toks GROUP BY eval_id
    ),
    train_toks AS (
        SELECT doc_id AS train_id, token FROM toks WHERE source <> 'src0'
    ),
    overlap AS (
        SELECT e.eval_id, t.train_id, COUNT(*) AS n_common
        FROM eval_toks e JOIN train_toks t USING (token)
        GROUP BY e.eval_id, t.train_id
    )
    SELECT o.eval_id, o.train_id,
           ROUND(CAST(o.n_common AS DOUBLE) / s.n_eval, 4) AS containment
    FROM overlap o JOIN eval_sizes s USING (eval_id)
    WHERE CAST(o.n_common AS DOUBLE) / s.n_eval >= 0.9
    """,
)
def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination screen: token-set CONTAINMENT |eval ∩ train| / |eval|
    of a bounded eval set against the training corpus — the "is this eval
    document effectively inside the training data" check, which Jaccard
    (dedup_near) misses when the train doc is a superset.

    Plan shape for 100 TB: the eval side is bounded (a benchmark suite is
    thousands of docs, not billions), so its exploded token table
    broadcasts; the train corpus explodes once and never shuffles — the
    per-(eval,train) overlap count aggregates map-side against the
    broadcast. The unbounded-both-sides version goes through MinHash
    banding first (dedup_minhash_lsh) and only exact-counts survivors —
    same escalation dedup_near documents."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("token"),
    )
    eval_toks = (
        toks.where((F.col("source") == "src0") & (F.col("doc_id") < 50))
        .select(F.col("doc_id").alias("eval_id"), "token")
    )
    eval_sizes = eval_toks.groupBy("eval_id").agg(F.count("*").alias("n_eval"))
    train_toks = toks.where(F.col("source") != "src0").select(
        F.col("doc_id").alias("train_id"), "token"
    )
    overlap = (
        train_toks.join(F.broadcast(eval_toks), "token")
        .groupBy("eval_id", "train_id")
        .agg(F.count("*").alias("n_common"))
    )
    ratio = F.col("n_common").cast("double") / F.col("n_eval")
    return (
        overlap.join(F.broadcast(eval_sizes), "eval_id")
        .where(ratio >= 0.9)
        .select("eval_id", "train_id", F.round(ratio, 4).alias("containment"))
    )
