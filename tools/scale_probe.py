"""Scale probe: replicate the sf0.1 fixtures N× into temp parquet (never
touching /root/testdata) and re-run headline queries — evidence that the
plans scale superlinearly-safe: time should grow ~linearly with data while
the plan shape (broadcasts, pushdown, partial aggs) stays identical.

Run: python tools/scale_probe.py [--mult 16]   → prints one JSON line
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_ingestor_web_app_spark import registry
from data_ingestor_web_app_spark.io import TABLES, table
from data_ingestor_web_app_spark.session import get_spark

PROBES = [
    "agg_groupby", "scan_pruned", "join_shuffle", "join_multiway",
    "topk_per_group", "tpch_q6",
    # round 2: fact-table-heavy additions (documents/embeddings are dims
    # here — not replicated — so LLM ops are excluded from the probe)
    "tpch_q5", "tpch_q10", "upsert_scd1",
    "events_ohlc_downsample", "events_pattern_detect",
    # wave 8-11: per-key-linear shapes only. Pair-generating ops
    # (attribution, point-in-time) are excluded: the replication scheme
    # multiplies per-user/per-customer DENSITY (keys are not shifted), so
    # their candidate sets grow quadratically under the probe — a
    # replication artifact, not how 16x more real-world keys would behave.
    "events_top_paths", "agg_bitmap_distinct", "agg_equidepth_histogram",
    "dq_expectations",
    # round 3: per-key-linear shapes (join_asof_forward and
    # join_interval_overlap are density-quadratic under replication and
    # excluded for the same reason as attribution)
    "agg_session_window_batch", "snapshot_diff", "upsert_merge_actions",
    "agg_ks_test", "agg_rfm_segments", "events_mau_28d_bitmap",
]


def replicate(spark, src_sf: str, mult: int) -> str:
    """Fact tables replicated mult× with shifted keys (so join fan-out and
    group cardinalities scale realistically); dims copied as-is."""
    out = tempfile.mkdtemp(prefix=f"scale_x{mult}_")
    key_shift = {
        "lineitem": ("l_orderkey", 10_000_000),
        "orders": ("o_orderkey", 10_000_000),
        "events": ("event_id", 10_000_000),
    }
    for name in TABLES:
        df = table(spark, src_sf, name)
        if name in key_shift:
            col, stride = key_shift[name]
            copies = [
                df.withColumn(col, F.col(col) + F.lit(i * stride)) for i in range(mult)
            ]
            big = copies[0]
            for c in copies[1:]:
                big = big.unionByName(c)
            big.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        else:
            df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = replicate(spark, args.src, args.mult)
    n_li = spark.read.parquet(f"{big_dir}/lineitem.parquet").count()

    def timed(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).count()
        return round(time.perf_counter() - t0, 3)

    # warm both paths
    timed("agg_groupby", args.src)
    base = {n: timed(n, args.src) for n in PROBES}
    big = {n: timed(n, big_dir) for n in PROBES}
    ratios = {n: round(big[n] / max(base[n], 1e-9), 1) for n in PROBES}
    print(
        json.dumps(
            {
                "mult": args.mult,
                "lineitem_rows": n_li,
                "base_sec": base,
                "scaled_sec": big,
                "time_ratio": ratios,
                "note": f"data x{args.mult}, ideal time ratio <= {args.mult} (sublinear = overheads amortizing)",
            }
        )
    )


if __name__ == "__main__":
    main()
