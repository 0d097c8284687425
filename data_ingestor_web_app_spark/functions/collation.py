"""Collation-aware string semantics (Spark 4 COLLATE) — case-insensitive
comparison pushed into the engine instead of lower()-wrapping every
expression.

Reference parity: the reference engine (reference/main.go) compares log
levels case-sensitively after upper-casing at ingest; collations are the
declarative version of that normalization (SURVEY.md §2C widening).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


@query(
    "fn_collation",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN contains(p_name, 'red') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_red_ci,
           CAST(SUM(CASE WHEN lower(p_type) = 'promo' THEN 0 ELSE 1 END)
                AS BIGINT) AS n_not_promo_ci
    FROM part
    GROUP BY p_brand
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive matching via UTF8_LCASE collation: contains() with
    an upper-case needle and equality against a lower-case literal both
    succeed because the COLLATION, not a wrapper function, defines
    equivalence. The oracle states the same predicates in DuckDB's
    default (case-sensitive) collation with the case pre-folded — the
    hash match proves the collated semantics.

    Scale note: collation is an expression-level property — the plan is
    an ordinary scan + single agg with map-side partials; unlike
    lower(col) = 'x', a collated comparison remains eligible for future
    collation-aware data-source pushdown, and never materializes a
    second folded column."""
    p = table(spark, sf_dir, "part")
    name_ci = F.collate("p_name", "UTF8_LCASE")
    type_ci = F.collate("p_type", "UTF8_LCASE")
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum(F.when(F.contains(name_ci, F.lit("RED")), 1).otherwise(0)).alias(
            "n_red_ci"
        ),
        F.sum(F.when(type_ci == F.lit("promo"), 0).otherwise(1)).alias(
            "n_not_promo_ci"
        ),
    )
