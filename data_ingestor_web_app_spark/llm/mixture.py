"""Wave-15: training-mixture weight allocation.

After the corpus-hygiene stages (dedup, quality, decontamination), a
pretraining run must decide HOW MUCH of each source to sample — the
data-mixing step (DoReMi / Pile-style source weighting, public). This
operator computes deterministic quality-and-size-aware weights and a
token allocation against a fixed budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_BUDGET = 100_000  # target tokens to allocate across sources


@query(
    "pipeline_mixture_weights",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               LEN(STRING_SPLIT(text, ' ')) AS n,
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS nd
        FROM documents
    ),
    per AS (
        SELECT source, SUM(n) AS tokens,
               ROUND(AVG(nd * 1.0 / n), 6) AS quality
        FROM toks GROUP BY source
    ),
    wt AS (
        SELECT source, tokens, quality,
               quality * quality * SQRT(tokens) AS w
        FROM per
    ),
    tot AS (SELECT SUM(w) AS sw FROM wt)
    SELECT source, CAST(tokens AS BIGINT) AS tokens, quality,
           ROUND(w / sw, 6) AS weight,
           CAST(FLOOR(w / sw * {_BUDGET}) AS BIGINT) AS alloc_tokens
    FROM wt, tot
    """,
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source mixing weights for a 100k-token training budget:
    quality (mean distinct-token ratio, the inverse of the repetition
    signal) squared times sqrt(size) — up-weight clean sources, damp
    sheer-volume dominance — normalized into sampling weights and an
    integer token allocation. Quality is rounded to 6dp BEFORE weighting
    so the whole allocation replays bit-identically in the oracle.

    Scale shape: one groupBy(source) pass with map-side partials over the
    tokenized corpus; the normalization constant is a one-row broadcast
    (sum over #sources values); allocation is scalar math on the tiny
    per-source frame. The expensive input signals (dedup rate, repetition)
    are the UPSTREAM operators' outputs — this stage is O(#sources)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.size(F.split("text", " ")).alias("n"),
        F.size(F.array_distinct(F.split("text", " "))).alias("nd"),
    )
    per = toks.groupBy("source").agg(
        F.sum("n").alias("tokens"),
        F.round(F.avg(F.col("nd") * 1.0 / F.col("n")), 6).alias("quality"),
    )
    wt = per.select(
        "source",
        "tokens",
        "quality",
        (F.col("quality") * F.col("quality") * F.sqrt("tokens")).alias("w"),
    )
    tot = wt.agg(F.sum("w").alias("sw"))
    return wt.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "quality",
        F.round(F.col("w") / F.col("sw"), 6).alias("weight"),
        F.floor(F.col("w") / F.col("sw") * _BUDGET).cast("bigint").alias("alloc_tokens"),
    )
