"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], timing full materialization (count + collect of a
bounded head, never a full driver collect). Warm-up pass excluded from
timing so JVM/codegen startup doesn't pollute per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestor_web_app_spark import registry
from data_ingestor_web_app_spark.session import get_spark

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: flagship + the shuffle/join/window/LLM-heavy paths that
# dominate at scale. Streaming replay queries are excluded (their runtime is
# test-scaffolding file IO, not operator time).
HEADLINE = [
    "agg_groupby",
    "scan_pruned",
    "join_shuffle",
    "join_multiway",
    "join_asof",
    "agg_rollup",
    "win_running_sum",
    "topk_per_group",
    "limit_topk",
    "fn_math",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_assign",
    "text_tokenize_wordcount",
    "text_filter_quality",
    "tpch_q3",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    "agg_salted_twophase",
    "subquery_correlated",
]


def run_once(spark, name: str) -> float:
    t0 = time.perf_counter()
    df = registry.QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM, codegen, parquet footer caches
    run_once(spark, "agg_groupby")
    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = round(run_once(spark, name), 3)
    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
