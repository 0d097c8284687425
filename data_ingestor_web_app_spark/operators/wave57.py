"""Wave-57: distributed Misra-Gries heavy hitters with exact recount,
conversion funnel with per-step time windows, consistent-hash shard
routing vs mod-N. Back-of-registry module.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_MG_K = 750


@query(
    "agg_heavy_hitters_mg",
    oracle="""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents),
    f AS (
        SELECT doc_id, UNNEST(tk) AS tok, GENERATE_SUBSCRIPTS(tk, 1) AS i
        FROM t
    ),
    g AS (
        SELECT f1.tok || ' ' || f2.tok AS g
        FROM f f1 JOIN f f2 ON f2.doc_id = f1.doc_id AND f2.i = f1.i + 1
    ),
    c AS (SELECT g, COUNT(*) AS n FROM g GROUP BY g)
    SELECT g AS bigram, CAST(n AS BIGINT) AS n
    FROM c WHERE n > (SELECT COUNT(*) FROM g) / 750.0
    """,
)
def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent bigrams above the phi=1/750 support threshold via
    DISTRIBUTED MISRA-GRIES (Misra & Gries 1982; merge guarantee per
    Agarwal et al., public): each partition keeps only k=750 counters
    over its gram stream (any key with global freq > N/k must exceed
    its share in some partition, so the union of per-partition summaries
    is a guaranteed candidate superset), then ONLY the candidates are
    exactly recounted and thresholded. Output is therefore exact — the
    sketch bounds the shuffle, never the answer.

    Scale shape: this is the 100 TB replacement for groupBy-everything:
    the full gram stream never shuffles — per-partition state is a fixed
    750 counters, the candidate set (<= 750 x partitions keys) drives a
    semi-join recount with map-side partials. The oracle is the naive
    full groupBy, proving sketch+recount == exact."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), "
                "i -> concat(t[i], ' ', t[i+1])) ELSE array() END"
            )
        ).alias("g")
    )
    # total folded in as a 1-row broadcast frame — no build-time job
    totalf = grams.agg(F.count("*").cast("long").alias("total"))

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for g in pdf["g"]:
                if g in counters:
                    counters[g] += 1
                elif len(counters) < _MG_K:
                    counters[g] = 1
                else:  # decrement-all step: evict zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"g": list(counters.keys())})

    candidates = grams.mapInPandas(mg_partition, schema="g string").distinct()
    exact = (
        grams.join(candidates, "g", "left_semi")
        .groupBy("g")
        .agg(F.count("*").alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(totalf))
        .where(F.col("n") > F.col("total") / 750.0)
        .select(F.col("g").alias("bigram"), F.col("n").cast("long").alias("n"))
    )


@query(
    "events_funnel_windowed",
    oracle="""
    WITH t0 AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    t1 AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN t0 ON t0.user_id = e.user_id
        WHERE e.event_type = 'click'
          AND e.ts > t0.t0 AND e.ts <= t0.t0 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN t1 ON t1.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    j AS (
        SELECT t0.user_id, t0.t0, t1.t1, t2.t2,
               DATE_DIFF('microsecond', t0.t0, t1.t1) / 1000000.0 AS gap01,
               DATE_DIFF('microsecond', t1.t1, t2.t2) / 1000000.0 AS gap12
        FROM t0 LEFT JOIN t1 ON t1.user_id = t0.user_id
                LEFT JOIN t2 ON t2.user_id = t0.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_view,
           CAST(COUNT(t1) AS BIGINT) AS n_click_24h,
           CAST(COUNT(t2) AS BIGINT) AS n_purchase_24h,
           ROUND(QUANTILE_CONT(gap01, 0.5), 4) AS median_gap_view_click_sec,
           ROUND(QUANTILE_CONT(gap12, 0.5), 4) AS median_gap_click_purchase_sec
    FROM j
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel with PER-STEP TIME WINDOWS: first view, then
    first click within 24 h of it, then first purchase within 24 h of
    that click — the attribution-grade funnel (events_funnel counts any
    later occurrence; real conversion windows expire). Emits stage
    counts and median step latencies.

    Determinism: step times are MINs of exact timestamps; gaps are
    microsecond-exact integer differences divided once; Spark
    percentile() and DuckDB QUANTILE_CONT bit-match on doubles.

    Scale shape: every stage is a groupBy/join on user_id — one shuffle
    key throughout, so AQE coalesces the chain onto one exchange
    lineage; windows never materialize per-event state."""
    e = table(spark, sf_dir, "events")
    t0 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    t1 = (
        e.where(F.col("event_type") == "click")
        .join(t0, "user_id")
        .where(
            (F.col("ts") > F.col("t0"))
            & (F.col("ts") <= F.col("t0") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        e.where(F.col("event_type") == "purchase")
        .join(t1, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    j = (
        t0.join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .select(
            "t0",
            "t1",
            "t2",
            (F.col("t1").cast("double") - F.col("t0").cast("double")).alias("gap01"),
            (F.col("t2").cast("double") - F.col("t1").cast("double")).alias("gap12"),
        )
    )
    return j.agg(
        F.count("*").cast("long").alias("n_view"),
        F.count("t1").cast("long").alias("n_click_24h"),
        F.count("t2").cast("long").alias("n_purchase_24h"),
        F.round(F.expr("percentile(gap01, 0.5)"), 4).alias("median_gap_view_click_sec"),
        F.round(F.expr("percentile(gap12, 0.5)"), 4).alias(
            "median_gap_click_purchase_sec"
        ),
    )


@query(
    "pipeline_consistent_hash_router",
    oracle="""
    WITH ring16 AS (
        SELECT ss.s AS shard,
               CAST('0x' || SUBSTR(MD5('shard' || CAST(ss.s AS VARCHAR)
                    || ':v' || CAST(vv.v AS VARCHAR)), 1, 8) AS BIGINT) AS pt
        FROM (SELECT UNNEST(RANGE(16)) AS s) ss,
             (SELECT UNNEST(RANGE(8)) AS v) vv
    ),
    ring20 AS (
        SELECT ss.s AS shard,
               CAST('0x' || SUBSTR(MD5('shard' || CAST(ss.s AS VARCHAR)
                    || ':v' || CAST(vv.v AS VARCHAR)), 1, 8) AS BIGINT) AS pt
        FROM (SELECT UNNEST(RANGE(20)) AS s) ss,
             (SELECT UNNEST(RANGE(8)) AS v) vv
    ),
    docs AS (
        SELECT doc_id,
               CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                   AS h
        FROM documents
    ),
    a16 AS (
        SELECT d.doc_id, ARG_MIN(r.shard, (r.pt - d.h + 4294967296) % 4294967296)
                   AS shard16
        FROM docs d CROSS JOIN ring16 r GROUP BY d.doc_id
    ),
    a20 AS (
        SELECT d.doc_id, ARG_MIN(r.shard, (r.pt - d.h + 4294967296) % 4294967296)
                   AS shard20
        FROM docs d CROSS JOIN ring20 r GROUP BY d.doc_id
    ),
    j AS (
        SELECT d.doc_id, d.h, a16.shard16, a20.shard20
        FROM docs d JOIN a16 ON a16.doc_id = d.doc_id
                    JOIN a20 ON a20.doc_id = d.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN h % 16 <> h % 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS moved_mod,
           CAST(SUM(CASE WHEN shard16 <> shard20 THEN 1 ELSE 0 END) AS BIGINT)
               AS moved_ring,
           ROUND(SUM(CASE WHEN h % 16 <> h % 20 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS mod_moved_frac,
           ROUND(SUM(CASE WHEN shard16 <> shard20 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS ring_moved_frac
    FROM j
    """,
)
def pipeline_consistent_hash_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash shard routing (Karger et al., STOC'97, public)
    vs naive mod-N, measured on a 16 -> 20 shard expansion: mod-N
    reassigns ~19/20 of documents (every key whose hash lands
    differently under the two moduli), the hash ring moves only the
    arcs the four new shards claim. This is the router a 100 TB corpus
    uses to grow its shard fleet without rewriting it.

    Determinism: all placement is md5 arithmetic (bit-identical in both
    engines); ring ownership is ARG_MIN over distinct clockwise
    distances (md5 ring points never collide in the fixture, so the
    argmin is total).

    Scale shape: each ring is a 128/160-entry SORTED LITERAL ARRAY baked
    into the projection (the ring points are pure md5 arithmetic, so the
    driver derives them without touching data); ownership is a binary-
    search-shaped `filter + element_at` over that array — the corpus is
    assigned in a single zero-shuffle projection and only the final
    global aggregate exchanges partials (plan-pinned in
    tests/test_scale_plans.py)."""
    import hashlib

    d = table(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    docs = d.select("doc_id", h.alias("h"))

    def ring_owner(n_shards: int):
        """Column: owning shard = first ring point clockwise of h (wrap
        to the smallest point). Ring literals mirror Spark's md5."""
        pts = sorted(
            (
                int(hashlib.md5(f"shard{s}:v{v}".encode()).hexdigest()[:8], 16),
                s,
            )
            for s in range(n_shards)
            for v in range(8)
        )
        ring = F.array(
            *[
                F.struct(F.lit(pt).alias("pt"), F.lit(s).alias("shard"))
                for pt, s in pts
            ]
        )
        succ = F.filter(ring, lambda x: x["pt"] >= F.col("h"))
        return F.coalesce(
            F.try_element_at(succ, F.lit(1))["shard"], F.lit(pts[0][1])
        )

    j = docs.select(
        "doc_id",
        "h",
        ring_owner(16).alias("shard16"),
        ring_owner(20).alias("shard20"),
    )
    moved_mod = F.when(F.col("h") % 16 != F.col("h") % 20, 1).otherwise(0)
    moved_ring = F.when(F.col("shard16") != F.col("shard20"), 1).otherwise(0)
    return j.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(moved_mod).cast("long").alias("moved_mod"),
        F.sum(moved_ring).cast("long").alias("moved_ring"),
        F.round(F.sum(moved_mod) * 1.0 / F.count("*"), 6).alias("mod_moved_frac"),
        F.round(F.sum(moved_ring) * 1.0 / F.count("*"), 6).alias("ring_moved_frac"),
    )
