"""Fuzzy entity matching: edit-distance dedup with neighborhood blocking.

The entity-resolution counterpart of the document near-dup family
(llm/dedup.py): match RECORDS whose keys differ by typos, not documents
whose token sets overlap.

Reference parity: SURVEY.md §2C widening (no reference counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "dedup_fuzzy_names",
    oracle="""
    SELECT a.s_suppkey AS suppkey_a,
           b.s_suppkey AS suppkey_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
    FROM supplier a
    JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name dedup: supplier-name pairs within levenshtein distance 1.

    The Spark plan never goes all-pairs: equal-length strings at edit
    distance ≤ 1 differ in at most one position, so by pigeonhole they
    agree EXACTLY on at least one half of the 9-digit suffix. Candidates =
    (equi-join on half1) ∪ (equi-join on half2), then exact levenshtein
    verification on the survivors — the standard neighborhood-blocking
    scheme (distance ≤ k → split into k+1 fragments). The DuckDB oracle
    does the naive quadratic join, so the hash match proves the blocked
    candidate set is LOSSLESS, not just plausible.

    Plan shape for 100 TB: two equi-joins on short fragment keys (uniform,
    broadcastable-or-shuffled like any key join) + a distinct — versus the
    unusable O(n²) cross join. Fragment frequency skew (a hot half-key) is
    ordinary join skew: AQE or salting, same as everywhere else."""
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.substring("s_name", 10, 5).alias("h1"),
        F.substring("s_name", 15, 4).alias("h2"),
    )
    a = s.select(
        F.col("s_suppkey").alias("suppkey_a"),
        F.col("s_name").alias("name_a"),
        F.col("h1").alias("h1a"),
        F.col("h2").alias("h2a"),
    )
    b = s.select(
        F.col("s_suppkey").alias("suppkey_b"),
        F.col("s_name").alias("name_b"),
        F.col("h1").alias("h1b"),
        F.col("h2").alias("h2b"),
    )
    lt = F.col("suppkey_a") < F.col("suppkey_b")
    c1 = a.join(b, (F.col("h1a") == F.col("h1b")) & lt).select(
        "suppkey_a", "suppkey_b", "name_a", "name_b"
    )
    c2 = a.join(b, (F.col("h2a") == F.col("h2b")) & lt).select(
        "suppkey_a", "suppkey_b", "name_a", "name_b"
    )
    cand = c1.unionByName(c2).distinct()
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.where(dist <= 1)
        .select("suppkey_a", "suppkey_b", dist.cast("int").alias("dist"))
    )
