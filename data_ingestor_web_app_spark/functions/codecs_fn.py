"""Wave-32: binary-text codec functions and week-over-week deltas.

fn_base64 rounds out the codec corner of the scalar matrix (hex is
covered by fn_hex / the reference's %x parity; base64 is the other
wire-encoding every ingest boundary meets). events_wow_change is the
week-over-week dashboard delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "fn_base64",
    oracle="""
    SELECT doc_id,
           BASE64(CAST(SUBSTR(text, 1, 30) AS BLOB)) AS b64,
           LENGTH(SUBSTR(text, 1, 30)) AS n_plain,
           LENGTH(BASE64(CAST(SUBSTR(text, 1, 30) AS BLOB))) AS n_encoded,
           CAST(FROM_BASE64(BASE64(CAST(SUBSTR(text, 1, 30) AS BLOB))) AS VARCHAR)
               = SUBSTR(text, 1, 30) AS roundtrip_ok
    FROM documents WHERE doc_id < 200
    """,
)
def fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round trip over a text prefix: the encoded
    value, the 4⌈n/3⌉ length expansion, and the decode-equals-original
    proof per row — the wire-codec completeness check next to fn_hex
    (the reference's %x parity). Both engines emit RFC 4648 standard
    alphabet without line wrapping, so the strings hash identically.

    Scale: per-row codegen expressions in the scan stage; the encoded
    column is what a JSON/REST sink would actually carry for binary
    payloads."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    t = F.substring("text", 1, 30)
    b64 = F.base64(t.cast("binary"))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.length(t).alias("n_plain"),
        F.length(b64).alias("n_encoded"),
        (F.unbase64(b64).cast("string") == t).alias("roundtrip_ok"),
    )


@query(
    "events_wow_change",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(FLOOR(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
                          / 7.0) AS BIGINT) AS week,
               COUNT(*) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n, total_value,
           LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
           ROUND((n - LAG(n) OVER (PARTITION BY event_type ORDER BY week))
                 * 100.0
                 / LAG(n) OVER (PARTITION BY event_type ORDER BY week), 4)
               AS pct_change
    FROM weekly
    """,
)
def events_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change per event type: weekly counts and value
    totals with the previous week's count and the percentage delta — the
    first chart of every growth dashboard, anchored to a fixed epoch
    (2024-01-01) so week numbering is calendar-stable across reruns.

    Scale shape: one map-side-combined groupBy over (type, week); the
    LAG window partitions by type over a handful of week rows. The
    same anchored-week key is what an incremental refresh would
    partition the metrics table by."""
    e = table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7.0
    ).cast("bigint")
    weekly = e.groupBy("event_type", week.alias("week")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "week",
        "n",
        "total_value",
        prev.alias("prev_n"),
        F.round((F.col("n") - prev) * 100.0 / prev, 4).alias("pct_change"),
    )
