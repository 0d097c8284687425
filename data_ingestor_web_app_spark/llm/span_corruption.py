"""Wave-31: span-corruption planning and burstiness diagnostics.

pipeline_span_corruption plans the T5/UL2 denoising objective (Raffel et
al. 2020, public) over the corpus: deterministic mask spans, sentinel
accounting, and the input/target length split the batch builder needs.
events_burstiness complements events_interarrival_stats with the Fano
factor — the variance/mean dispersion index that separates Poisson
traffic from bursty traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "pipeline_span_corruption",
    oracle="""
    WITH toks AS (
        SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS n FROM documents
    ),
    plan AS (
        -- spans of 3 start at positions 0, 8, 16, ... (every 8th token);
        -- a span must fit entirely: starts <= n - 3
        SELECT doc_id, n,
               CASE WHEN n >= 3
                    THEN CAST(FLOOR((n - 3) / 8.0) AS BIGINT) + 1
                    ELSE 0 END AS n_spans
        FROM toks
    )
    SELECT doc_id, n AS n_tokens, n_spans,
           n_spans * 3 AS masked_tokens,
           n - n_spans * 3 + n_spans AS input_len,
           n_spans * 3 + n_spans AS target_len,
           ROUND(n_spans * 3.0 / n, 6) AS corruption_rate
    FROM plan WHERE doc_id < 300
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption (T5 denoising) plan per document: fixed-stride
    3-token mask spans every 8 tokens (≈37% corruption on long docs —
    deterministic, unlike the sampled spans of training time, so the
    accounting is oracle-checkable), with the exact sequence-length
    arithmetic the batch builder needs — input keeps unmasked tokens plus
    one sentinel per span; target is the masked tokens plus their
    sentinels.

    Scale: pure per-row arithmetic on token counts — no shuffle at all;
    the real masking pass is the same projection emitting token arrays
    instead of counts, feeding the packing operators
    (pipeline_pack_offsets) with input_len/target_len."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    n = F.size(F.split("text", " "))
    n_spans = F.when(
        n >= 3, (F.floor((n - 3) / 8.0)).cast("bigint") + 1
    ).otherwise(F.lit(0).cast("bigint"))
    out = d.select("doc_id", n.alias("n_tokens"), n_spans.alias("n_spans"))
    return out.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        (F.col("n_spans") * 3).alias("masked_tokens"),
        (F.col("n_tokens") - F.col("n_spans") * 3 + F.col("n_spans")).alias(
            "input_len"
        ),
        (F.col("n_spans") * 3 + F.col("n_spans")).alias("target_len"),
        F.round(F.col("n_spans") * 3.0 / F.col("n_tokens"), 6).alias(
            "corruption_rate"
        ),
    )


@query(
    "events_burstiness",
    oracle="""
    WITH per_min AS (
        SELECT event_type, DATE_TRUNC('minute', ts) AS m, COUNT(*) AS n
        FROM events GROUP BY event_type, DATE_TRUNC('minute', ts)
    )
    SELECT event_type,
           COUNT(*) AS n_active_minutes,
           ROUND(AVG(n), 6) AS mean_per_min,
           ROUND(VAR_SAMP(n), 6) AS var_per_min,
           ROUND(VAR_SAMP(n) / AVG(n), 6) AS fano_factor
    FROM per_min GROUP BY event_type
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) per event type: variance-to-mean ratio of
    per-minute arrival counts over ACTIVE minutes — ≈1 for Poisson
    traffic, >1 for bursty, <1 for regular/paced — the dispersion index
    that, with events_interarrival_stats, decides buffer sizing and
    anomaly thresholds.

    Scale shape: minute bucketing is one map-side-combined groupBy; the
    dispersion summary re-aggregates the (type, minute) frame with
    single-pass mergeable mean/M2 partials."""
    e = table(spark, sf_dir, "events")
    per_min = e.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("m")
    ).agg(F.count("*").alias("n"))
    return per_min.groupBy("event_type").agg(
        F.count("*").alias("n_active_minutes"),
        F.round(F.avg("n"), 6).alias("mean_per_min"),
        F.round(F.var_samp("n"), 6).alias("var_per_min"),
        F.round(F.var_samp("n") / F.avg("n"), 6).alias("fano_factor"),
    )
