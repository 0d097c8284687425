"""MERGE-style upsert (SCD-1) expressed as a pure DataFrame plan.

Spark OSS without a table format has no MERGE INTO over raw parquet, but
the semantics — apply a changelog of inserts/updates/deletes to a base
snapshot — are a full-outer join + per-column coalesce, which is exactly
what copy-on-write MERGE does under Delta/Iceberg. Expressing it
declaratively keeps it oracle-checkable and shows the 100 TB shape: one
key-partitioned shuffle join of base x changelog; with a partitioned/
bucketed base only the touched partitions would be rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import query


def _changelog(o: DataFrame) -> DataFrame:
    """Deterministic changelog derived from orders: every key ending in 0 is
    updated (status -> 'X', price +1000), every key ending in 5 is deleted,
    and keys % 1000 == 7 spawn a brand-new insert at key + 1e9."""
    upd = o.where(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit("U").alias("op"),
        F.lit("X").alias("new_status"),
        (F.col("o_totalprice") + 1000.0).alias("new_totalprice"),
    )
    dele = o.where(F.col("o_orderkey") % 10 == 5).select(
        F.col("o_orderkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast("double").alias("new_totalprice"),
    )
    ins = o.where(F.col("o_orderkey") % 1000 == 7).select(
        (F.col("o_orderkey") + 1000000000).alias("key"),
        F.lit("I").alias("op"),
        F.lit("N").alias("new_status"),
        F.round(F.col("o_totalprice"), 2).alias("new_totalprice"),
    )
    return upd.unionByName(dele).unionByName(ins)


@query(
    "upsert_scd1",
    oracle="""
    WITH chg AS (
        SELECT o_orderkey AS key, 'U' AS op, 'X' AS new_status,
               o_totalprice + 1000.0 AS new_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, 'D', NULL, NULL
        FROM orders WHERE o_orderkey % 10 = 5
        UNION ALL
        SELECT o_orderkey + 1000000000, 'I', 'N', ROUND(o_totalprice, 2)
        FROM orders WHERE o_orderkey % 1000 = 7
    )
    SELECT COALESCE(c.key, b.o_orderkey) AS o_orderkey,
           COALESCE(c.new_status, b.o_orderstatus) AS o_orderstatus,
           ROUND(COALESCE(c.new_totalprice, b.o_totalprice), 2) AS o_totalprice,
           CASE WHEN c.key IS NULL THEN 'kept'
                WHEN b.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM orders b
    FULL OUTER JOIN chg c ON c.key = b.o_orderkey
    WHERE COALESCE(c.op, '') <> 'D'
    """,
)
def upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics over the orders snapshot with a derived
    changelog (10% updates, 10% deletes, 0.1% inserts; the update bumps
    the price by an exactly-representable +1000.0 — never a derived
    per-row ROUND on money, which lands on HALF_UP-vs-libm boundaries):
    WHEN MATCHED AND op='U' THEN UPDATE, WHEN MATCHED AND op='D' THEN
    DELETE, WHEN NOT MATCHED THEN INSERT — as one full-outer join +
    coalesce projection. The merge_action column makes each row's fate
    auditable (and hash-checked).

    Scale: one shuffle on the merge key for each side; the changelog is
    usually far smaller than the base, so AQE picks a broadcast/shuffle
    strategy per its runtime size. Under a real lakehouse format the same
    plan drives copy-on-write file rewrites; partition/bucket pruning on
    the key bounds the rewrite set."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    chg = _changelog(o)
    return (
        o.join(chg, o.o_orderkey == chg.key, "full_outer")
        .where(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("key"), F.col("o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("new_status"), F.col("o_orderstatus")).alias("o_orderstatus"),
            F.round(F.coalesce(F.col("new_totalprice"), F.col("o_totalprice")), 2).alias("o_totalprice"),
            F.when(F.col("key").isNull(), "kept")
            .when(F.col("o_orderkey").isNull(), "inserted")
            .otherwise("updated")
            .alias("merge_action"),
        )
    )
