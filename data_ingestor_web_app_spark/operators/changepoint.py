"""Wave-24: CUSUM change detection, Gini concentration, image quadrants.

events_change_point turns the reference's running counters
(/root/reference/main.go:259-289) into the question monitoring actually
asks of them: WHEN did the level shift. mm_image_quadrants deepens the
multimodal family with a spatial-pooling feature whose oracle re-derives
every pixel analytically (same contract as mm_decode_image).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "events_change_point",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    mu AS (
        SELECT event_type, AVG(n) AS m FROM daily GROUP BY event_type
    ),
    cusum AS (
        SELECT daily.event_type, daily.d,
               SUM(daily.n - mu.m) OVER (PARTITION BY daily.event_type
                                         ORDER BY daily.d
                                         ROWS UNBOUNDED PRECEDING) AS c
        FROM daily JOIN mu ON mu.event_type = daily.event_type
    ),
    ranked AS (
        SELECT event_type, d, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(c) DESC, d) AS rk
        FROM cusum
    )
    SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS change_day,
           ROUND(c, 4) AS cusum_peak
    FROM ranked WHERE rk = 1
    """,
)
def events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: cumulative sum of
    (daily count − overall mean) peaks, in absolute value, at the day the
    level shifted (Page 1954, public) — the classic answer to "when did
    this metric change" from nothing but the counter history.

    Scale shape: daily counts are one map-side-combined groupBy; the
    CUSUM walk partitions by event type (per-type sorted state over
    #days rows, never global); the argmax is a WindowGroupLimit. Exact
    integer counts minus a single double mean keep the accumulation
    deterministic at 4dp in both engines."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("n")
    )
    mu = daily.groupBy("event_type").agg(F.avg("n").alias("m"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = daily.join(mu, "event_type").select(
        "event_type", "d", F.sum(F.col("n") - F.col("m")).over(w).alias("c")
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.abs("c").desc(), "d")
    )
    return (
        cusum.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.round("c", 4).alias("cusum_peak"),
        )
    )


@query(
    "agg_gini",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(value) OVER (PARTITION BY event_type) AS s
        FROM events
    )
    SELECT event_type,
           ROUND(SUM((2.0 * i - n - 1) * value) / (n * s), 6) AS gini
    FROM ranked GROUP BY event_type, n, s
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of event value per type — the
    inequality measure behind "do a few whales carry the revenue":
    G = Σ(2i−n−1)·xᵢ / (n·Σx) over values sorted ascending (ties broken
    by event id so the rank assignment replays identically in DuckDB).

    Scale shape: one window partitioned by event type (per-type sort,
    uniform key) produces rank and the per-type totals; the final
    aggregation has map-side partials. 0 = perfectly equal, →1 = fully
    concentrated."""
    e = table(spark, sf_dir, "events")
    wp = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(wp.orderBy("value", "event_id")).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("value").over(wp).alias("s"),
    )
    return ranked.groupBy("event_type", "n", "s").agg(
        F.round(
            F.sum((2.0 * F.col("i") - F.col("n") - 1) * F.col("value"))
            / (F.col("n") * F.col("s")),
            6,
        ).alias("gini")
    ).select("event_type", "gini")


@query(
    "mm_image_quadrants",
    oracle="""
    WITH docs AS (
        SELECT doc_id, 16 + doc_id % 16 AS w, 16 + (doc_id * 3) % 16 AS h
        FROM documents WHERE doc_id < 200
    ),
    ys AS (SELECT doc_id, w, h, UNNEST(RANGE(h)) AS y FROM docs),
    px AS (SELECT doc_id, w, h, y, UNNEST(RANGE(w)) AS x FROM ys),
    quads AS (
        SELECT doc_id,
               CASE WHEN y < h // 2 THEN 0 ELSE 2 END
                 + CASE WHEN x < w // 2 THEN 0 ELSE 1 END AS quadrant,
               (x * 7 + y * 13 + doc_id) % 256 AS v
        FROM px
    )
    SELECT doc_id, quadrant,
           COUNT(*) AS n_px,
           ROUND(AVG(v), 4) AS mean_intensity
    FROM quads GROUP BY doc_id, quadrant
    """,
)
def mm_image_quadrants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial pooling over REAL decoded images: each PNG decodes
    (CRC-verified stdlib codec) and its pixels pool into 2x2 quadrant
    mean intensities — the cheapest spatial feature map (the first layer
    of classical image featurization). The oracle re-derives every pixel
    from the generator formula, so the hash match proves decode AND
    pooling geometry (row-major layout, floor-split quadrant boundaries)
    are exact.

    Scale: per-row Python via Arrow batches, no shuffle until the final
    (doc, quadrant) aggregate of 4 rows per image."""
    from data_ingestor_web_app_spark.llm.codecs import png_decode_gray
    from data_ingestor_web_app_spark.llm.multimodal import _image_payloads

    payloads = _image_payloads(spark, sf_dir)

    def quad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, pix = png_decode_gray(bytes(payload))
                sums = [0] * 4
                counts = [0] * 4
                for y in range(h):
                    for x in range(w):
                        q = (0 if y < h // 2 else 2) + (0 if x < w // 2 else 1)
                        sums[q] += pix[y * w + x]
                        counts[q] += 1
                for q in range(4):
                    rows.append(
                        (doc_id, q, counts[q], round(sums[q] / counts[q], 4))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "quadrant", "n_px", "mean_intensity"]
            )

    return payloads.mapInPandas(
        quad_batches,
        schema="doc_id long, quadrant int, n_px long, mean_intensity double",
    )
