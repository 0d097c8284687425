"""Wave-19: dirty-input robustness and semantic corners.

The reference's only input validation is the empty-payload drop
(/root/reference/main.go:108-110); real feeds deliver malformed rows,
NULL join keys, and evolving token inventories. These operators pin the
engine's behavior on each.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT
        CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS n_corrupt,
        COUNT(*) - CAST(CEIL(COUNT(*) / 10.0) AS BIGINT) AS n_good,
        CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN doc_id ELSE 0 END) AS BIGINT) AS sum_good_ids
    FROM documents
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion of a feed where every 10th line is
    malformed (wrong arity — the classic truncated-write corruption):
    good rows parse, bad rows land in ``_corrupt_record`` instead of
    killing the job, and the query reports corrupt/good counts plus a
    checksum over the surviving ids. The oracle derives the same numbers
    from the corruption rule. DROPMALFORMED / FAILFAST are the other two
    contract points (asserted in pytest).

    Scale: malformed handling is per-row inside the scan — no extra pass;
    the corrupt-record column makes bad input QUERYABLE (dead-letter
    audit) rather than a crash, which is the difference between a 100 TB
    backfill finishing or dying at hour nine."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = os.path.join(scratch_dir("csv_mal_"), "feed.csv")
    # doc_id % 10 == 0 rows are written with a missing field + stray quote
    lines = d.select(
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit('"'), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat_ws(",", F.col("doc_id").cast("string"), "lang", F.lit("ok"))
        )
        .alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(out)
    parsed = (
        spark.read.schema("doc_id LONG, lang STRING, status STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        .cache()  # Spark requires caching to query corrupt-record columns alone
    )
    return parsed.agg(
        F.count("_corrupt_record").alias("n_corrupt"),
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("doc_id")).otherwise(0)
        ).alias("sum_good_ids"),
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderkey % 100 END AS k
        FROM orders
    ),
    r AS (
        SELECT CASE WHEN n % 3 = 0 THEN NULL ELSE n END AS k,
               n AS rv
        FROM (SELECT UNNEST(RANGE(0, 100)) AS n)
    )
    SELECT COALESCE(CAST(l.k AS VARCHAR), '<null>') AS k,
           COUNT(*) AS n_pairs,
           MIN(l.o_orderkey) AS min_key
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY 1
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantic corner
    that separates "joined on a nullable column correctly" from "lost 14%
    of rows". A synthetic right side carries every-3rd-key-NULL so both
    null populations pair up; output groups by key with null rendered
    explicitly.

    Scale WARNING (by design, documented): a null-safe join hashes ALL
    null keys to one partition — a hot key by construction. At volume,
    split the plan: equi-join the non-null keys, cross-join the two
    (small, pre-aggregated) null sides, union — same result, no hot
    partition. This operator keeps the direct form so the semantics have
    a driver-checked row."""
    o = table(spark, sf_dir, "orders")
    l = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderkey") % 100)
        .alias("k"),
    )
    r = spark.range(0, 100).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id")).alias("rk"),
        F.col("id").alias("rv"),
    )
    return (
        l.join(r, l.k.eqNullSafe(r.rk))
        .groupBy(F.coalesce(F.col("k").cast("string"), F.lit("<null>")).alias("k"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


@query(
    "text_bpe_merge_step",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ),
    flat AS (
        SELECT doc_id, UNNEST(t) AS tok, GENERATE_SUBSCRIPTS(t, 1) AS i
        FROM toks
    ),
    pairs AS (
        SELECT a.tok || ' ' || b.tok AS pair, COUNT(*) AS n
        FROM flat a JOIN flat b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        GROUP BY 1
    ),
    best AS (
        SELECT pair, n FROM pairs ORDER BY n DESC, pair LIMIT 1
    ),
    merged AS (
        SELECT d.doc_id,
               REPLACE(' ' || d.text || ' ',
                       ' ' || b.pair || ' ',
                       ' ' || REPLACE(b.pair, ' ', '_') || ' ') AS mtext
        FROM documents d CROSS JOIN best b
    )
    SELECT b.pair AS merged_pair, b.n AS pair_count,
           CAST(SUM(LEN(STRING_SPLIT(TRIM(m.mtext), ' '))) AS BIGINT) AS tokens_after,
           (SELECT CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) FROM documents)
                   AS tokens_before
    FROM merged m CROSS JOIN best b
    GROUP BY b.pair, b.n
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training step at word granularity (Sennrich et al. 2016,
    public): count all adjacent token pairs corpus-wide, pick the most
    frequent (tie: lexicographic), rewrite every NON-OVERLAPPING
    occurrence as a single merged symbol, and report the token-count
    drop. Left-to-right greedy replacement in both engines (Spark
    regexp_replace and DuckDB REPLACE both scan left-to-right, and the
    sentinel-space framing makes their overlap behavior identical).

    Scale shape: pair counting is the engine's bigram pass (one shuffle,
    map-side partials); the argmax is a 1-row TakeOrdered broadcast; the
    rewrite is a pure projection. A full tokenizer training run is this
    operator iterated with the merged vocabulary fed back in — each step
    the same plan."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), "
                    "i -> concat(t[i], ' ', t[i + 1])) ELSE array() END"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
    )
    best = pairs.orderBy(F.col("n").desc(), F.col("pair")).limit(1)
    merged = d.crossJoin(F.broadcast(best)).select(
        "doc_id",
        "pair",
        "n",
        F.expr(
            "replace(concat(' ', text, ' '), concat(' ', pair, ' '), "
            "concat(' ', replace(pair, ' ', '_'), ' '))"
        ).alias("mtext"),
    )
    before = d.agg(
        F.sum(F.size(F.split("text", " "))).alias("tokens_before")
    )
    return (
        merged.groupBy(F.col("pair").alias("merged_pair"), F.col("n").alias("pair_count"))
        .agg(F.sum(F.size(F.split(F.trim("mtext"), " "))).alias("tokens_after"))
        .crossJoin(F.broadcast(before))
    )
