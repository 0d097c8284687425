"""Ad-hoc runner for the registry-wide static-plan lint (VERDICT r10 item 1).

Sweeps every registered batch query through plans.lint.lint_query and prints
one line per violation; the enforcing copy of this sweep lives in
tests/test_plan_lint.py with the reviewed allowlist.

Usage: python tools/lint_plans.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from data_ingestor_web_app_spark import registry
from data_ingestor_web_app_spark.plans.lint import lint_query
from data_ingestor_web_app_spark.session import get_spark

STREAM_PREFIXES = ("stream_", "sink_")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="optional JSONL output path")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names or [
        n for n in registry.QUERIES if not n.startswith(STREAM_PREFIXES)
    ]
    sink = open(args.out, "w") if args.out else None
    n_bad = 0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            vs = lint_query(spark, registry.QUERIES[name], args.sf)
            err = None
        except Exception as e:  # builder/planning failure is its own finding
            vs, err = [], f"{type(e).__name__}: {e}"
        dt = time.time() - t0
        row = {
            "name": name,
            "violations": [str(v) for v in vs],
            "error": err,
            "sec": round(dt, 2),
        }
        if vs or err:
            n_bad += 1
            print(json.dumps(row), flush=True)
        if sink:
            sink.write(json.dumps(row) + "\n")
            sink.flush()
        if i % 50 == 49:
            print(f"# {i + 1}/{len(names)} swept, {n_bad} flagged", flush=True)
            spark.catalog.clearCache()
    if sink:
        sink.close()
    print(f"# done: {len(names)} swept, {n_bad} flagged", flush=True)


if __name__ == "__main__":
    main()
