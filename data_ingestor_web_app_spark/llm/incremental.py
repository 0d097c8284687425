"""Wave-22: incremental-batch dedup and resampling confidence intervals.

pipeline_incremental_dedup is the shape every CONTINUOUS ingest pipeline
runs (the reference's loop, /root/reference/main.go:199-257, never stops
receiving): each new batch must be deduped against the ALREADY-ACCEPTED
corpus without rescanning it pairwise — hash anti-join for exact dups,
then the usual near-dup machinery only on survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "pipeline_incremental_dedup",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, source,
               MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
                   STRING_SPLIT(text, ' '))), ' ')) AS h
        FROM documents
    ),
    old_corpus AS (
        SELECT doc_id, h FROM hashed WHERE doc_id % 5 <> 0
    ),
    new_batch AS (
        SELECT doc_id, source, h FROM hashed WHERE doc_id % 5 = 0
    ),
    flagged AS (
        SELECT n.source,
               CASE WHEN o.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
        FROM new_batch n
        LEFT JOIN (SELECT DISTINCT h FROM old_corpus) o ON o.h = n.h
    )
    SELECT source,
           COUNT(*) AS n_new,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_vs_corpus,
           CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_accepted
    FROM flagged GROUP BY source
    """,
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the arriving batch (doc_id % 5 == 0
    stands in for "today's crawl") is checked against the accepted corpus
    by content hash — a LEFT ANTI/SEMI join on the hash, NEVER a pairwise
    comparison — and the per-source accept/reject audit is emitted. The
    near-dup stages (minhash bands vs the stored signature index) chain
    onto the survivors with the same incremental shape.

    Scale shape: the corpus side reduces to its DISTINCT hash set (one
    map-side-combined pass, or zero if the hash index is maintained as a
    table — the production posture); the batch joins it on the hash key.
    Batch size, not corpus size, drives the shuffle: that asymmetry is
    the whole point of incremental dedup."""
    d = table(spark, sf_dir, "documents")
    bag = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " ")))))
    old_hashes = (
        d.where(F.col("doc_id") % 5 != 0).select(bag.alias("h")).distinct()
    )
    new_batch = d.where(F.col("doc_id") % 5 == 0).select("source", bag.alias("h"))
    flagged = new_batch.join(
        old_hashes.withColumn("is_old", F.lit(1)), "h", "left"
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_new"),
        F.sum(F.coalesce("is_old", F.lit(0))).alias("n_dup_vs_corpus"),
        (F.count("*") - F.sum(F.coalesce("is_old", F.lit(0)))).alias("n_accepted"),
    )


@query(
    "agg_subsample_ci",
    oracle="""
    WITH resamples AS (
        SELECT b, value
        FROM events
        CROSS JOIN (SELECT UNNEST(RANGE(0, 10)) AS b)
        WHERE SUBSTR(MD5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 1)
              IN ('0','1','2','3','4','5','6','7')
    ),
    means AS (
        SELECT b, AVG(value) AS m FROM resamples GROUP BY b
    )
    SELECT COUNT(*) AS n_resamples,
           ROUND(AVG(m), 6) AS mean_of_means,
           ROUND(STDDEV_SAMP(m), 6) AS se_est,
           ROUND(MIN(m), 6) AS lo,
           ROUND(MAX(m), 6) AS hi
    FROM means
    """,
)
def agg_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampling confidence interval for the mean event value: 10
    deterministic half-samples (row ∈ resample b iff the first hex digit
    of md5(event_id:b) < 8 — the same pseudo-randomness in both engines,
    no RNG state), each averaged, and the spread of the resample means
    reported as the uncertainty estimate — the bootstrap-family answer
    when a closed-form standard error is unavailable.

    Scale shape: the 10x replication happens at the AGGREGATION input
    (explode over b), and each resample mean is a map-side-combined
    partial — one shuffle of 10 x #partitions partial rows, raw data
    scanned once. Production bootstraps (B=1000) use the same plan with
    a Poisson-weight column instead of inclusion, still one pass."""
    e = table(spark, sf_dir, "events").select("event_id", "value")
    # 10x replication via explode(sequence) — same rows as the former
    # crossJoin(range(10)) but with NO join node at all: the multiplier is
    # a per-row generator, so the plan can't degrade to a product and the
    # static-plan lint stays clean (r11)
    rs = (
        e.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .where(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("b").cast("string"))),
                1,
                1,
            ).isin(list("01234567"))
        )
        .groupBy("b")
        .agg(F.avg("value").alias("m"))
    )
    return rs.agg(
        F.count("*").alias("n_resamples"),
        F.round(F.avg("m"), 6).alias("mean_of_means"),
        F.round(F.stddev_samp("m"), 6).alias("se_est"),
        F.round(F.min("m"), 6).alias("lo"),
        F.round(F.max("m"), 6).alias("hi"),
    )
