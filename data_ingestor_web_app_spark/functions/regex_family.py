"""Wave-23: regex scalar family, seasonality profile, SFT formatting.

Rounds out the scalar-function matrix (functions/scalar.py covers
string/hex/date/math/cond/array/json; PII scrubbing covers replace) with
the extraction side of the regex family, plus two composition queries:
the weekly seasonality profile every ops dashboard draws, and the
instruction-tuning formatting stage of an SFT data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '[a-z]+', 0) AS first_word,
           LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{5,}')) AS n_long_words,
           REGEXP_MATCHES(text, 'table') AS mentions_table,
           REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled_prefix
    FROM (SELECT doc_id, SUBSTR(text, 1, 40) AS text FROM documents
          WHERE doc_id < 200)
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction family over a bounded text prefix: first match,
    all-matches count, boolean match, and global character-class
    replacement. Patterns are restricted to the common subset where
    Java's regex (Spark) and RE2 (DuckDB) agree — character classes,
    bounded repetition, literals; no lookaround, no backreferences
    (either engine would diverge or reject).

    Scale: all four are codegen'd per-row expressions in the scan stage —
    regex cost is per-byte, the usual caveat is catastrophic backtracking,
    which the RE2-compatible subset rules out by construction."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    t = F.substring("text", 1, 40)
    return d.select(
        "doc_id",
        F.regexp_extract(t, "[a-z]+", 0).alias("first_word"),
        F.size(F.expr("regexp_extract_all(substr(text, 1, 40), '[a-z]{5,}', 0)")).alias(
            "n_long_words"
        ),
        t.rlike("table").alias("mentions_table"),
        F.regexp_replace(t, "[aeiou]", "_").alias("devoweled_prefix"),
    )


@query(
    "events_seasonality_profile",
    oracle="""
    WITH base AS (
        SELECT CAST(STRFTIME(ts, '%w') AS INT) AS dow,
               CAST(STRFTIME(ts, '%H') AS INT) AS hod,
               value
        FROM events
    ),
    cells AS (
        SELECT dow, hod, COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
        FROM base GROUP BY dow, hod
    ),
    tot AS (SELECT SUM(n) AS tn FROM cells)
    SELECT dow, hod, n, avg_value,
           ROUND(n * 1.0 / tn, 6) AS traffic_share
    FROM cells, tot
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: traffic count, mean value, and share by
    (day-of-week × hour-of-day) cell — the 7×24 heatmap behind capacity
    planning and anomaly baselining (an observed/expected ratio against
    this profile is the standard traffic-anomaly score).

    Scale shape: one groupBy over 168 cells with map-side partials; the
    share normalization is a one-row broadcast. Day-of-week uses the
    0=Sunday convention in both engines (strftime %w ↔ dayofweek−1)."""
    e = table(spark, sf_dir, "events")
    base = e.select(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").alias("hod"),
        "value",
    )
    cells = base.groupBy("dow", "hod").agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value")
    )
    tot = cells.agg(F.sum("n").alias("tn"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        "avg_value",
        F.round(F.col("n") * 1.0 / F.col("tn"), 6).alias("traffic_share"),
    )


@query(
    "pipeline_sft_format",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
        WHERE doc_id < 200
    ),
    split AS (
        SELECT doc_id,
               ARRAY_TO_STRING(t[1:CAST(FLOOR(LEN(t) / 2.0) AS BIGINT)], ' ') AS prompt,
               ARRAY_TO_STRING(t[CAST(FLOOR(LEN(t) / 2.0) AS BIGINT) + 1:LEN(t)], ' ')
                   AS completion,
               LEN(t) AS n_tokens
        FROM toks
    )
    SELECT doc_id,
           '<|user|>' || prompt || '<|assistant|>' || completion AS sample,
           n_tokens,
           LEN(STRING_SPLIT(prompt, ' ')) AS prompt_tokens,
           n_tokens <= 256 AS fits_context
    FROM split
    """,
)
def pipeline_sft_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT sample formatting: each document splits at its token midpoint
    into a prompt/completion pair rendered into a chat template
    (`<|user|>…<|assistant|>…`), with token accounting and a
    context-window fit flag — the last formatting stage before
    tokenization in an instruction-tuning data pipeline.

    Scale: pure per-row projection (split/slice/concat, all codegen);
    the context flag is where a real pipeline would route to the packing
    operators (pipeline_pack_offsets / pipeline_pack_greedy)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    t = F.split("text", " ")
    half = (F.size(t) / 2).cast("int")
    prompt = F.concat_ws(" ", F.slice(t, 1, half))
    completion = F.concat_ws(" ", F.expr("slice(split(text, ' '), cast(size(split(text, ' ')) / 2 as int) + 1, size(split(text, ' ')))"))
    return d.select(
        "doc_id",
        F.concat(
            F.lit("<|user|>"), prompt, F.lit("<|assistant|>"), completion
        ).alias("sample"),
        F.size(t).alias("n_tokens"),
        F.size(F.split(prompt, " ")).alias("prompt_tokens"),
        (F.size(t) <= 256).alias("fits_context"),
    )
