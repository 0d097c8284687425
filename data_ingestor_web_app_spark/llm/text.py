"""Text analysis operators (north-star LLM-pipeline additions): tokenize/
wordcount, corpus stats, quality filtering, heuristic language ID, token
counting, document fingerprinting.

Everything is built-in string/array/higher-order functions — the whole
text-analysis pass is one scan, no Python, no shuffle except the final
small aggregations.

Grounding (PAPERS.md): the scan-once lexicon-scoring shape (tokenize →
marker-set hit-rates → per-doc score) follows the distributed lexicon
pipeline of "Large Scale Sentiment Analysis on Twitter with Spark"
(EDBT 2016), with language markers in place of sentiment lexica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "text_tokenize_wordcount",
    oracle="""
    WITH toks AS (
        SELECT LOWER(UNNEST(STRING_SPLIT(text, ' '))) AS token FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS n FROM toks WHERE token <> '' GROUP BY token
    )
    SELECT token, n, rk FROM (
        SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rk
        FROM counts) t
    WHERE rk <= 50
    """,
)
def text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + top-50 terms. explode → groupBy(token) (map-side partial
    count, shuffle carries one row per distinct token) → top-k via
    orderBy().limit(50), which compiles to TakeOrderedAndProject (per-partition
    heap + driver merge of 50-row heaps — never a global sort, even with 10^8+
    distinct tokens). Ranks are derived over the 50 survivors only, so the
    window sort is bounded at k rows regardless of corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("raw")).select(F.lower("raw").alias("token"))
    counts = toks.where(F.col("token") != "").groupBy("token").agg(F.count("*").alias("n"))
    top50 = counts.orderBy(F.col("n").desc(), F.col("token")).limit(50)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return top50.withColumn("rk", F.row_number().over(w))


@query(
    "text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(CASE WHEN LENGTH(text) = n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats + the n_chars=length(text) validation
    invariant from FIXTURES.md."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0)).alias("n_valid"),
    )


_STOPWORDS = ("the", "a", "of", "and", "to")


@query(
    "text_filter_quality",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, lang,
               STRING_SPLIT(text, ' ') AS toks,
               LENGTH(text) AS n_ch
        FROM documents
    ), metrics AS (
        SELECT doc_id, lang,
               LEN(toks) AS n_tokens,
               CAST(LIST_SUM(LIST_TRANSFORM(toks, t -> LENGTH(t))) AS DOUBLE) / LEN(toks) AS avg_tok_len,
               CAST(LEN(LIST_FILTER(toks, t -> t IN {_STOPWORDS})) AS DOUBLE) / LEN(toks) AS stop_ratio,
               CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS distinct_ratio
        FROM m
    )
    SELECT doc_id, lang, n_tokens, avg_tok_len, stop_ratio, distinct_ratio
    FROM metrics
    WHERE n_tokens BETWEEN 20 AND 90
      AND avg_tok_len BETWEEN 3.0 AND 8.0
      AND stop_ratio < 0.4
    """,
)
def text_filter_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gates (the C4/Gopher-style filter stage): token
    count band, average token length band, stopword-ratio cap. Emits the
    metrics so downstream stages can re-threshold without recomputing.
    Ratio arithmetic is int-division-free and identical in both engines."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    sum_len = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    metrics = d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        (sum_len.cast("double") / n_tokens).alias("avg_tok_len"),
        (n_stop.cast("double") / n_tokens).alias("stop_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens).alias("distinct_ratio"),
    )
    return metrics.where(
        F.col("n_tokens").between(20, 90)
        & F.col("avg_tok_len").between(3.0, 8.0)
        & (F.col("stop_ratio") < 0.4)
    )


from data_ingestor_web_app_spark.llm.text_common import LANG_MARKERS as _LANG_MARKERS
from data_ingestor_web_app_spark.llm.text_common import TEXT_LANGID_ORACLE


@query("text_langid", oracle=TEXT_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-marker hit-rate per language, argmax
    with a fixed tie order (en>de>es>fr) so prediction is deterministic.
    One scan, no shuffle; a real system swaps the marker sets for n-gram
    profiles without changing the plan shape."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    m = d.select("doc_id", F.col("lang").alias("labeled_lang"), toks.alias("toks"))

    def score(lang: str):
        markers = _LANG_MARKERS[lang]
        return (
            F.size(F.filter(F.col("toks"), lambda t: t.isin(*markers))).cast("double")
            / F.size(F.col("toks"))
        ).alias(f"score_{lang}")

    scored = m.select("doc_id", "labeled_lang", score("en"), score("de"), score("es"), score("fr"))
    pred = (
        F.when(F.col("score_en") >= F.greatest("score_de", "score_es", "score_fr"), "en")
        .when(F.col("score_de") >= F.greatest("score_es", "score_fr"), "de")
        .when(F.col("score_es") >= F.col("score_fr"), "es")
        .otherwise("fr")
    )
    return scored.withColumn("pred_lang", pred)


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_ws_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS n_word_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}')) AS n_bpe_ish,
           CAST(LENGTH(text) AS DOUBLE) / LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS chars_per_token
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, regex word tokens, and a
    BPE-ish bounded-piece regex ([a-z]{1,4} — greedy fixed-size chunks as a
    stand-in for real BPE merges, same plan shape)."""
    d = table(spark, sf_dir, "documents")
    words = F.regexp_extract_all("text", F.lit("[a-z]+"), 0)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(words).alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0)).alias("n_bpe_ish"),
        (F.length("text").cast("double") / F.size(words)).alias("chars_per_token"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           MD5(text) AS content_md5,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(toks)), ' ')) AS bag_fingerprint,
           MD5(ARRAY_TO_STRING(LIST_SLICE(toks, 1, 8), ' ')) AS prefix_fingerprint
    FROM documents JOIN t USING (doc_id)
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: raw content hash, order-insensitive bag
    fingerprint (sorted distinct tokens — catches reordered near-dups), and
    a prefix fingerprint (first 8 tokens — catches common-prefix dups).
    All md5-hex, lowercase in both engines."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        F.md5(F.array_join(F.sort_array(F.array_distinct(toks)), " ").cast("binary")).alias("bag_fingerprint"),
        F.md5(F.array_join(F.slice(toks, 1, 8), " ").cast("binary")).alias("prefix_fingerprint"),
    )


@query(
    "text_chunk_overlap",
    oracle="""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
               LEN(STRING_SPLIT(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, toks, n, UNNEST(RANGE(1, GREATEST(n - 4, 1) + 1, 15)) AS start
        FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / 15 + 1 AS BIGINT) AS chunk_idx,
           ARRAY_TO_STRING(LIST_SLICE(toks, start, LEAST(start + 19, n)), ' ') AS chunk_text,
           LEAST(start + 19, n) - start + 1 AS chunk_tokens
    FROM starts
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: split each document into 20-token chunks
    with stride 15 (5-token overlap) — the tokenize→chunk stage of an LLM
    corpus pipeline. Chunk starts are generated with F.sequence + explode
    (one scan, rows multiply ~n/stride); tail chunks shorter than 5 tokens
    are suppressed by capping the start range (start <= n-4), matching the
    oracle's RANGE bound. All JVM-side; the chunk text itself is a slice
    join, no Python."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    starts = base.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("n") - 4, F.lit(1)), F.lit(15))
        ).alias("start"),
    )
    chunk_end = F.least(F.col("start") + 19, F.col("n"))
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / 15 + 1).cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice("toks", F.col("start"), chunk_end - F.col("start") + 1), " "
        ).alias("chunk_text"),
        (chunk_end - F.col("start") + 1).alias("chunk_tokens"),
    )


@query(
    "pipeline_training_corpus",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, text, STRING_SPLIT(text, ' ') AS t FROM documents
    ),
    quality AS (
        SELECT doc_id, lang, text, t, LEN(t) AS n
        FROM toks
        WHERE LEN(t) BETWEEN 20 AND 90
          AND CAST(LEN(LIST_FILTER(t, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / LEN(t) < 0.4
    ),
    dedup AS (
        SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY SHA256(text)
    ),
    kept AS (
        SELECT q.* FROM quality q JOIN dedup d ON q.doc_id = d.doc_id
    ),
    chunks AS (
        SELECT doc_id, lang, t, n,
               UNNEST(RANGE(1, GREATEST(n - 4, 1) + 1, 15)) AS start
        FROM kept
    )
    SELECT doc_id, lang,
           CAST((start - 1) / 15 + 1 AS BIGINT) AS chunk_idx,
           ARRAY_TO_STRING(LIST_SLICE(t, start, LEAST(start + 19, n)), ' ') AS chunk_text,
           LEAST(start + 19, n) - start + 1 AS chunk_tokens,
           MD5(ARRAY_TO_STRING(LIST_SLICE(t, start, LEAST(start + 19, n)), ' ')) AS chunk_fingerprint
    FROM chunks
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM training-corpus pipeline END-TO-END in one declarative plan:
    quality gates → exact dedup (keep lowest doc_id per content hash) →
    20-token/15-stride chunking → per-chunk md5 fingerprint.

    The point: each stage is an operator proven individually elsewhere in
    the inventory; composed here they stay ONE Catalyst plan — the filter
    pushes into the scan, dedup is one hash shuffle, chunk explode and
    fingerprints are map-side. At 100 TB this whole pipeline is two
    shuffles — the dedup groupBy plus the keep-set semi-join on doc_id.
    The keep-set is O(#distinct documents), so it is NEVER broadcast: a
    left_semi shuffle join keeps both sides partitioned on doc_id and
    survives an arbitrarily large corpus (AQE may still downgrade to
    broadcast when the runtime size is genuinely small)."""
    d = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = d.select("doc_id", "lang", "text", t.alias("t"), F.size(t).alias("n"))
    stop_ratio = F.size(F.filter(F.col("t"), lambda x: x.isin("the", "a", "of", "and", "to"))).cast(
        "double"
    ) / F.col("n")
    quality = toks.where(F.col("n").between(20, 90) & (stop_ratio < 0.4))
    dedup = quality.groupBy(F.sha2(F.col("text").cast("binary"), 256)).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = quality.join(dedup.select("doc_id"), "doc_id", "left_semi")
    chunks = kept.select(
        "doc_id",
        "lang",
        "t",
        "n",
        F.explode(F.sequence(F.lit(1), F.greatest(F.col("n") - 4, F.lit(1)), F.lit(15))).alias("start"),
    )
    end = F.least(F.col("start") + 19, F.col("n"))
    chunk_text = F.array_join(F.slice("t", F.col("start"), end - F.col("start") + 1), " ")
    return chunks.select(
        "doc_id",
        "lang",
        ((F.col("start") - 1) / 15 + 1).cast("long").alias("chunk_idx"),
        chunk_text.alias("chunk_text"),
        (end - F.col("start") + 1).alias("chunk_tokens"),
        F.md5(chunk_text.cast("binary")).alias("chunk_fingerprint"),
    )


@query(
    "text_rolling_hash",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               LIST_TRANSFORM(STRING_SPLIT(text, ' '),
                              tok -> LENGTH(tok) * 31 + UNICODE(SUBSTR(tok, 1, 1))) AS codes
        FROM documents
    )
    SELECT doc_id,
           LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), codes),
                       (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash,
           LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), LIST_SLICE(codes, 1, 8)),
                       (acc, x) -> (acc * 31 + x) % 1000000007) AS prefix8_hash
    FROM t
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True polynomial rolling-hash fingerprint: left fold of
    (acc*31 + token_code) mod 1e9+7 over the token sequence (token_code =
    31*len + first char code — order-sensitive, unlike the bag fingerprint
    in text_fingerprint). Sequential modular arithmetic folds identically
    in Spark's aggregate() and DuckDB's list_reduce, so it's hash-exact.
    One scan, zero shuffles; the prefix8 variant is the cheap
    common-prefix dedup key."""
    d = table(spark, sf_dir, "documents")
    codes = F.transform(
        F.split("text", " "),
        lambda tok: (F.length(tok) * 31 + F.ascii(F.substring(tok, 1, 1))).cast("long"),
    )

    def fold(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("long"),
            lambda acc, x: (acc * 31 + x) % F.lit(1000000007).cast("long"),
        )

    return d.select(
        "doc_id",
        codes.alias("_codes"),
    ).select(
        "doc_id",
        fold(F.col("_codes")).alias("rolling_hash"),
        fold(F.slice("_codes", 1, 8)).alias("prefix8_hash"),
    )
