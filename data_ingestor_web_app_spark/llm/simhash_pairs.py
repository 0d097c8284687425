"""Wave-18: SimHash hamming pair join — completes the simhash dedup path.

dedup_simhash (llm/dedup.py) emits fingerprints and notes that "banding
on fingerprint prefixes is the scalable hamming-join strategy"; this
operator EXECUTES that strategy end-to-end: 4 disjoint 15-bit bands, a
per-band bucket join (pigeonhole: hamming ≤ 3 forces agreement on at
least one whole band), exact popcount verification on candidates, and
first-matching-band dedup so no shuffle-distinct is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query

_HAM_MAX = 3  # pairs within this hamming distance; 4 bands cover it exactly


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reuse dedup_simhash's exact fingerprint computation (same md5-digest
    sign-sum — llm/dedup.py), keeping the two operators bit-compatible."""
    from data_ingestor_web_app_spark.llm.dedup import dedup_simhash

    return dedup_simhash(spark, sf_dir).select("doc_id", "simhash")


from data_ingestor_web_app_spark.llm.dedup import _SIMHASH_ORACLE as _FP_ORACLE

_PAIRS_ORACLE = f"""
    WITH fp AS ({_FP_ORACLE}),
    br AS (
        SELECT doc_id, simhash, b.band,
               (simhash >> (b.band * 15)) & 32767 AS val
        FROM fp CROSS JOIN (SELECT UNNEST(RANGE(4)) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sa, b.simhash AS sb
        FROM br a JOIN br b
          ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {_HAM_MAX}
    """


@query("dedup_simhash_pairs", oracle=_PAIRS_ORACLE)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ 3, via band-bucket
    join: each 60-bit fingerprint splits into four 15-bit bands; a pair
    closer than 4 bit-flips MUST match on some whole band (pigeonhole),
    so only band-equal doc pairs are ever generated, then verified
    exactly with bit_count(xor). A pair is emitted only from its FIRST
    matching band — a pure filter on the two band vectors, so no
    distinct shuffle.

    Promoted from rows-only to hash-exact in r6 alongside dedup_simhash:
    the md5-digest fingerprints replay in DuckDB, so the whole
    band-join + popcount pipeline is oracle-verified (the oracle uses a
    DISTINCT where the Spark side uses the cheaper first-band filter —
    same pair set by construction).

    Scale shape: the index is 4 rows per document keyed by (band_idx,
    band_value) — candidate volume is bucket-collision-bound, identical
    in shape to dedup_minhash_lsh's band join; verification is one
    integer XOR+popcount per candidate, the cheapest verify step of any
    dedup path in the engine. pytest cross-checks every emitted pair
    against exact token-set Jaccard similarity ordering."""
    fp = _fingerprints(spark, sf_dir)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.expr(
            "transform(sequence(0, 3), i -> shiftright(simhash, i * 15) & 32767)"
        ).alias("bv"),
    )
    br = bands.select(
        "doc_id", "simhash", "bv", F.posexplode("bv").alias("band", "val")
    )
    a, b = br.alias("a"), br.alias("b")
    first_match = F.expr("array_position(zip_with(a.bv, b.bv, (x, y) -> x = y), true)")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(first_match - 1 == F.col("a.band"))
        .where(ham <= _HAM_MAX)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
    )


@query(
    "agg_welch_ttest",
    oracle="""
    WITH per AS (
        SELECT user_id % 2 AS variant,
               COUNT(*) AS n, AVG(value) AS m, VAR_SAMP(value) AS v
        FROM events GROUP BY user_id % 2
    ),
    wide AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
               MAX(CASE WHEN variant = 0 THEN m END) AS m0,
               MAX(CASE WHEN variant = 0 THEN v END) AS v0,
               MAX(CASE WHEN variant = 1 THEN n END) AS n1,
               MAX(CASE WHEN variant = 1 THEN m END) AS m1,
               MAX(CASE WHEN variant = 1 THEN v END) AS v1
        FROM per
    )
    SELECT n0, n1,
           ROUND(m1 - m0, 6) AS mean_diff,
           ROUND((m1 - m0) / SQRT(v0 / n0 + v1 / n1), 6) AS t_stat,
           ROUND(POW(v0 / n0 + v1 / n1, 2)
                 / (POW(v0 / n0, 2) / (n0 - 1) + POW(v1 / n1, 2) / (n1 - 1)),
                 2) AS df_welch
    FROM wide
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on the event value between the two
    hash-split variants: mean difference, t statistic, and the
    Welch–Satterthwaite effective degrees of freedom — the
    continuous-metric companion to events_ab_test_lift's two-proportion
    z-test.

    Scale shape: one map-side-combined groupBy(variant) carrying
    (count, mean, M2) partials — var_samp is single-pass mergeable — then
    O(1) scalar math on the 2-row frame."""
    per = (
        table(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
        )
    )
    wide = per.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("variant") == 0, F.col("v"))).alias("v0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("m"))).alias("m1"),
        F.max(F.when(F.col("variant") == 1, F.col("v"))).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    df_w = (se2 ** 2) / (
        (F.col("v0") / F.col("n0")) ** 2 / (F.col("n0") - 1)
        + (F.col("v1") / F.col("n1")) ** 2 / (F.col("n1") - 1)
    )
    return wide.select(
        "n0",
        "n1",
        F.round(F.col("m1") - F.col("m0"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m0")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df_w, 2).alias("df_welch"),
    )
