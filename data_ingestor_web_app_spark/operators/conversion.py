"""Wave-27: conversion latency, robust statistics, classifier audit.

text_langid_confusion embeds text_langid's full oracle as a CTE (the
same composition-is-verified pattern as pipeline_keep_best), turning the
classifier's per-document output into the confusion matrix and accuracy
a model card reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.llm.text_common import TEXT_LANGID_ORACLE
from data_ingestor_web_app_spark.registry import query


@query(
    "events_time_to_convert",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS first_purchase
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT user_id,
               DATE_DIFF('microsecond', first_view, first_purchase)
                   / 3600000000.0 AS hours_to_convert
        FROM firsts
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    )
    SELECT COUNT(*) AS n_converted,
           ROUND(QUANTILE_CONT(hours_to_convert, 0.5), 4) AS median_hours,
           ROUND(AVG(hours_to_convert), 4) AS mean_hours,
           ROUND(MIN(hours_to_convert), 4) AS min_hours,
           ROUND(MAX(hours_to_convert), 4) AS max_hours
    FROM conv
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: per user, the time from FIRST view to FIRST
    purchase (users whose first purchase precedes any view are excluded —
    no attributable funnel), summarized as count/median/mean/min/max
    hours — the latency histogram behind funnel-stage SLAs.

    Scale shape: one conditional-MIN groupBy(user_id) (two MIN partials
    in the same pass — the scan is never split per event type), then a
    global summary over one row per converted user; the median is an
    exact percentile over that per-user frame (approx_percentile at
    extreme user counts, identical plan)."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.where(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            (
                F.col("first_purchase").cast("double")
                - F.col("first_view").cast("double")
            )
            / 3600.0
        ).alias("hours_to_convert")
    )
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(hours_to_convert, 0.5)"), 4).alias("median_hours"),
        F.round(F.avg("hours_to_convert"), 4).alias("mean_hours"),
        F.round(F.min("hours_to_convert"), 4).alias("min_hours"),
        F.round(F.max("hours_to_convert"), 4).alias("max_hours"),
    )


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH qs AS (
        SELECT event_type,
               QUANTILE_CONT(value, 0.05) AS lo,
               QUANTILE_CONT(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           ROUND(AVG(e.value), 4) AS raw_mean,
           ROUND(AVG(CASE WHEN e.value < qs.lo THEN qs.lo
                          WHEN e.value > qs.hi THEN qs.hi
                          ELSE e.value END), 4) AS winsorized_mean,
           ROUND(qs.lo, 4) AS p05,
           ROUND(qs.hi, 4) AS p95
    FROM events e JOIN qs ON qs.event_type = e.event_type
    GROUP BY e.event_type, qs.lo, qs.hi
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: values clamped to the [p5, p95]
    band before averaging — the robust-statistics answer to outlier-
    sensitive means (billing anomalies, latency spikes). Reported next to
    the raw mean so the outlier influence is the visible delta.

    Scale shape: pass 1 computes the two exact percentiles per group
    (tree-reduced aggregate; approx_percentile at extreme cardinality,
    same plan); pass 2 re-joins the tiny per-group boundary row and
    clamps in the projection — both groupBys map-side combined. Spark's
    percentile() and DuckDB's QUANTILE_CONT interpolate identically on
    doubles (verified bit-exact for agg_equidepth_histogram)."""
    e = table(spark, sf_dir, "events")
    qs = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clamped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        e.join(F.broadcast(qs), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
        )
        .select(
            "event_type",
            "n",
            "raw_mean",
            "winsorized_mean",
            F.round("lo", 4).alias("p05"),
            F.round("hi", 4).alias("p95"),
        )
    )


def _confusion_oracle() -> str:
    return f"""
    WITH langid AS ({TEXT_LANGID_ORACLE})
    SELECT labeled_lang, pred_lang,
           COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY labeled_lang),
                 6) AS row_share
    FROM langid GROUP BY labeled_lang, pred_lang
    """


@query("text_langid_confusion", oracle=_confusion_oracle())
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier audit for the heuristic language ID: the labeled-vs-
    predicted confusion matrix with per-true-label recall shares — the
    table a model card prints. The oracle EMBEDS text_langid's oracle as
    a CTE (same composition-verified pattern as pipeline_keep_best), so
    the audited predictions are provably the operator's own.

    Scale shape: the classifier is a per-row projection; the matrix is a
    groupBy over |langs|² cells with map-side partials; the recall share
    rides a window over the tiny matrix."""
    from data_ingestor_web_app_spark.llm.text import text_langid
    from pyspark.sql import Window

    pred = text_langid(spark, sf_dir).select("labeled_lang", "pred_lang")
    cells = pred.groupBy("labeled_lang", "pred_lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "pred_lang",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6).alias("row_share"),
    )
