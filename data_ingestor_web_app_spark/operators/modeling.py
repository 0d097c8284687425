"""Dimensional-modeling and signal-processing window operators: SCD
type-2 history construction and an exact FIR (exponentially weighted)
filter over event streams.

Reference parity: the reference engine (reference/main.go) appends
immutable log records; SCD2 is the warehouse-side history-keeping of the
same append-only discipline (SURVEY.md §2C widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "upsert_scd2_history",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           o_orderpriority AS priority,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS valid_from,
           COALESCE(STRFTIME(LEAD(o_orderdate) OVER w, '%Y-%m-%d'),
                    '9999-12-31') AS valid_to,
           (LEAD(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def upsert_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2: turn an append-only change feed (orders as per-customer
    attribute changes) into versioned validity intervals — [valid_from,
    valid_to) per version, open-ended current row flagged.

    One window over (o_custkey ORDER BY o_orderdate, o_orderkey) supplies
    version number, interval end (lead), and currency flag in a single
    shuffle-sort — the standard one-pass SCD2 build. At 100 TB the
    partition key is the natural entity key, so the shuffle is the
    unavoidable history-clustering pass; everything after it is
    pipelined. The o_orderkey tie-break makes same-day changes a total
    order (determinism contract)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).alias("version"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    )


@query(
    "win_ewma",
    oracle="""
    SELECT user_id, event_id,
           value
           + LAG(value, 1, 0.0) OVER w * 0.5
           + LAG(value, 2, 0.0) OVER w * 0.25
           + LAG(value, 3, 0.0) OVER w * 0.125
           + LAG(value, 4, 0.0) OVER w * 0.0625
           + LAG(value, 5, 0.0) OVER w * 0.03125
           + LAG(value, 6, 0.0) OVER w * 0.015625
           + LAG(value, 7, 0.0) OVER w * 0.0078125 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving signal (8-tap FIR, α = 1/2) per user.

    Implemented as an explicit lag-chain rather than a frame SUM on
    purpose: every weight is a power of two (value · 2^-k is EXACT in
    IEEE — only the exponent changes) and the addition chain is a fixed
    left-to-right expression tree, so both engines round identically at
    each step and the result is bit-reproducible — a frame aggregate
    would leave the accumulation order to the engine. Eight lags over one
    window = ONE shuffle-sort on user_id; all eight taps read the same
    sorted run, no extra exchanges (verified: single Window node).

    The (ts, event_id) tie-break gives a total order per user, so lag
    offsets are deterministic even with equal timestamps."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = F.col("value")
    for k in range(1, 8):
        taps = taps + F.lag("value", k, 0.0).over(w) * F.lit(2.0 ** -k)
    return table(spark, sf_dir, "events").select(
        "user_id", "event_id", taps.alias("ewma")
    )
