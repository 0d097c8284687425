"""Interleaved A/B bench for attributing round-over-round drift
(VERDICT r6 item 3).

One invocation = one fresh JVM timing the target queries once each (after
the standard sf0.001 warm-up), printing a JSON line. The driver loop in
`tools/ab_drift.sh` alternates invocations between two checkouts (HEAD vs
a pinned worktree) so box-level noise (thermal, page cache, cron) hits
both sides equally; per-query medians over n>=7 interleaved pairs separate
real plan drift from contention.

Usage: python tools/ab_bench.py <repo_root> [query ...]
"""

from __future__ import annotations

import json
import sys
import time

REPO = sys.argv[1]
QUERIES = sys.argv[2:] or [
    "agg_groupby",
    "join_multiway",
    "sim_cosine_topk",
    "tpch_q18",
]
sys.path.insert(0, REPO)

from data_ingestor_web_app_spark import registry  # noqa: E402
from data_ingestor_web_app_spark.session import get_spark  # noqa: E402

registry.load_all()

SF_DIR = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES:
        registry.QUERIES[name](spark, WARM).count()
    out: dict[str, float] = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, SF_DIR).count()
        out[name] = round(time.perf_counter() - t0, 3)
    # ingest throughput leg (same shape as bench.py's bench_ingest)
    sys.path.insert(0, "/root/repo")  # bench module only exists at HEAD
    import bench

    bench.SF_DIR = SF_DIR
    bench.bench_ingest(spark, 100_000)  # warm the write path first
    secs, rps = bench.bench_ingest(spark, 1_000_000)
    out["ingest_1m_records"] = round(secs, 3)
    print(json.dumps({"repo": REPO, "times": out, "ingest_rps": round(rps)}))
    spark.stop()


if __name__ == "__main__":
    main()
