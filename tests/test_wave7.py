"""Semantic invariants for the wave-7 additions (dynamic partition
pruning, runtime bloom-filter join, z-order clustering). Oracle
hash-parity is covered by tools/check_oracle.py; these assert the plan
shapes and layout payoffs a value hash can't see.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.operators.zorder import _z_expr
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_dpp_plan_prunes_fact_partitions(spark):
    """The dim-side quarter filter must become a runtime partition
    filter (`dynamicpruning` subquery) on the month-partitioned fact
    scan — the whole point of the operator."""
    df = QUERIES["join_dpp_dates"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert df.count() == 3  # 1995-01..03


def test_bloom_join_filters_big_side_before_shuffle(spark):
    df = QUERIES["join_bloom_runtime"](spark, SF_SMALL)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized, optimized[:2000]


def test_zorder_buckets_bound_both_dimensions(spark):
    """Each top-6-bit z-bucket is one 32x32 tile: BOTH per-bucket spans
    stay < 32. A 1-D sort bounds only its own dimension (off-sort span
    approaches the full 256) — checked explicitly below."""
    rows = QUERIES["cluster_zorder"](spark, SF_SMALL).collect()
    assert rows, "no buckets"
    for r in rows:
        assert r.x_max - r.x_min < 32, r
        assert r.y_max - r.y_min < 32, r


def test_zorder_layout_prunes_either_dimension(spark):
    """Write the full 256x256 (xq, yq) grid z-sorted vs x-sorted into 16
    files each; a 16-wide y-stripe query concentrates in exactly the 4
    z-files whose Morton blocks (aligned 64x64 tiles) intersect the
    stripe, but is smeared across ALL 16 x-sorted files (each x-range
    file contains every y). `_metadata.file_name` counts the files
    holding qualifying rows — the footer-stats pruning proxy. A uniform
    grid (not the sf fixture, whose events span only ~48 distinct days)
    makes the block arithmetic exact and the margins deterministic."""
    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("xq"),
            (F.col("id") / 256).cast("long").alias("yq"),
        )
        .withColumn("zv", F.expr(_z_expr("xq", "yq")))
    )
    root = tempfile.mkdtemp(prefix="zorder_probe_")
    zpath, xpath = os.path.join(root, "z"), os.path.join(root, "x")
    (grid.repartitionByRange(16, "zv").sortWithinPartitions("zv")
     .write.mode("overwrite").parquet(zpath))
    (grid.repartitionByRange(16, "xq").sortWithinPartitions("xq")
     .write.mode("overwrite").parquet(xpath))

    def files_touched(path):
        return (
            spark.read.parquet(path)
            .where((F.col("yq") >= 64) & (F.col("yq") < 80))
            .select(F.col("_metadata.file_name")).distinct().count()
        )

    z_files, x_files = files_touched(zpath), files_touched(xpath)
    # 4 Morton blocks; repartitionByRange samples boundaries with a random
    # seed, so up to 2 extra boundary files can hold stripe rows run-to-run
    assert z_files <= 6, z_files
    assert x_files == 16, x_files
    assert z_files * 2 < x_files  # the layout payoff the operator claims
