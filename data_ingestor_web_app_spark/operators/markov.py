"""Wave-13 sequence statistics and as-of-family completion.

events_markov_transitions is the probabilistic companion to
events_top_paths (raw path counts); join_asof_nearest completes the
as-of family (backward `join_asof`, horizon-capped `join_asof_banded`,
nearest-either-direction here — the three orderings every time-series
store exposes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    ),
    t AS (
        SELECT src, dst, COUNT(*) AS n FROM seq
        WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (SELECT src, SUM(n) AS n_src FROM t GROUP BY src)
    SELECT t.src, t.dst, t.n,
           ROUND(t.n * 1.0 / tot.n_src, 6) AS p
    FROM t JOIN tot ON tot.src = t.src
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event timelines:
    P(next=dst | current=src), the summary behind next-action prediction
    and anomaly scoring on behavioral streams. Probabilities are rounded
    to 6dp after an exact integer count ratio, so rows hash identically in
    the DuckDB oracle.

    Scale shape: one shuffle on user_id for the LEAD window (per-user
    sort, bounded state), then a groupBy over at most |types|² keys with
    map-side partials; the row-normalization join touches |types| rows.
    Nothing is corpus-global except the tiny matrix itself."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    t = seq.where(F.col("dst").isNotNull()).groupBy("src", "dst").agg(
        F.count("*").alias("n")
    )
    tot = t.groupBy("src").agg(F.sum("n").alias("n_src"))
    return t.join(tot, "src").select(
        "src", "dst", "n", F.round(F.col("n") * 1.0 / F.col("n_src"), 6).alias("p")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY ABS(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                                         CAST(e.ts AS DATE))),
                            o.o_orderdate, o.o_orderkey
               ) AS rn
        FROM events e JOIN orders o ON o.o_custkey = e.user_id
        WHERE e.event_id < 2000
    )
    SELECT event_id, user_id, o_orderkey AS nearest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS nearest_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join: each event picks the order with the
    SMALLEST absolute day distance, either direction (ties: earlier date,
    then lower key) — the third member of the as-of family after backward
    (join_asof) and banded (join_asof_banded).

    Implementation: equi-join on the key, then argmin via a partially
    aggregatable min(struct(absdiff, date, key)) — map-side combine
    collapses each event's candidates to ONE row before the shuffle,
    where a row_number window would sort the full join fan-out. Bounded
    to event_id < 2000 to keep the driver compare small; the statistics
    are per-key, so the bound does not change the plan."""
    e = table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    o = table(spark, sf_dir, "orders")
    joined = e.join(o, o.o_custkey == e.user_id)
    absdiff = F.abs(
        F.datediff(F.col("ts").cast("date"), F.col("o_orderdate").cast("date"))
    )
    best = joined.groupBy("event_id", "user_id").agg(
        F.min(F.struct(absdiff.alias("d"), "o_orderdate", "o_orderkey")).alias("b")
    )
    return best.select(
        "event_id",
        "user_id",
        F.col("b.o_orderkey").alias("nearest_orderkey"),
        F.date_format("b.o_orderdate", "yyyy-MM-dd").alias("nearest_orderdate"),
    )


@query(
    "pipeline_dataset_cards",
    oracle="""
    WITH base AS (
        SELECT source, lang, n_chars, text,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
               MD5(text) AS h
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           ROUND(SUM((lang = 'en')::INT) * 1.0 / COUNT(*), 6) AS pct_en,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*), 6) AS dup_rate
    FROM base GROUP BY source
    """,
)
def pipeline_dataset_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset cards (the per-source audit sheet shipped with every public
    corpus release): document count, token volume, language spread,
    English share, average length, and exact-duplicate rate — one row per
    source, composing the engine's text statistics into the release
    artifact a data curator actually publishes.

    Scale shape: ONE groupBy(source) pass with map-side partials; the two
    distinct-aggregates (langs, content hashes) expand to the standard
    two-phase distinct plan on the same shuffle key. At 100 TB the exact
    dup_rate distinct would swap to an HLL sketch (agg_approx_distinct)
    with everything else unchanged."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(
            F.sum((F.col("lang") == "en").cast("int")) * 1.0 / F.count("*"), 6
        ).alias("pct_en"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(1.0 - F.countDistinct("h") * 1.0 / F.count("*"), 6).alias("dup_rate"),
    )
