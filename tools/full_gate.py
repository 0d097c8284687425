"""Full-registry oracle gate -> CORRECTNESS_FULL_r{N}.json artifact.

Runs EVERY registered query through Spark and its DuckDB oracle at sf0.01
(the driver's comparison protocol, via tools/check_oracle.py's canonical
comparator) and writes the per-query status + wall-clock artifact the
judge reads. Usage:

    python tools/full_gate.py --round 10 [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from check_oracle import compare  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    # Resolve the artifact's sf value BEFORE the ~20-minute sweep (ADVICE
    # r10: parsing it at artifact-write time meant a nonstandard --sf path
    # raised ValueError after the run and lost every result). Paths without
    # a trailing sf<scale> segment fall back to the raw string.
    try:
        sf_value: float | str = float(args.sf.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf_value = args.sf

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    from data_ingestor_web_app_spark.session import get_spark

    spark = get_spark("full-gate")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    out: dict[str, dict] = {}
    t_all = time.time()
    n_exact = n_rows = n_fail = 0
    for i, name in enumerate(sorted(queries)):
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            spdf = queries[name](spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            out[name] = {
                "status": "FAIL",
                "err": f"spark {type(exc).__name__}: {exc}"[:200],
                "wall_sec": round(time.time() - t0, 1),
            }
            n_fail += 1
            print(f"[{i + 1}/{len(queries)}] FAIL {name}", flush=True)
            continue
        if name not in oracles:
            out[name] = {
                "status": "rows_only",
                "rows": len(spdf),
                "wall_sec": round(time.time() - t0, 1),
            }
            n_rows += 1
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
            problems, _ = compare(name, spdf, dpdf)
        except Exception as exc:  # noqa: BLE001
            problems = [f"{type(exc).__name__}: {exc}"[:200]]
        wall = round(time.time() - t0, 1)
        if problems:
            out[name] = {"status": "FAIL", "err": "; ".join(problems)[:200], "wall_sec": wall}
            n_fail += 1
            print(f"[{i + 1}/{len(queries)}] FAIL {name}: {problems[0][:120]}", flush=True)
        else:
            out[name] = {"status": "exact", "rows": len(spdf), "wall_sec": wall}
            n_exact += 1
        if (i + 1) % 100 == 0:
            print(f"[{i + 1}/{len(queries)}] ... {n_exact} exact / {n_rows} rows-only / {n_fail} FAIL", flush=True)

    artifact = {
        "summary": {
            "sf": sf_value,
            "tool": f"tools/full_gate.py (full registry run, r{args.round})",
            "n_queries": len(queries),
            "n_exact": n_exact,
            "n_rows_only": n_rows,
            "n_fail": n_fail,
            "total_wall_sec": round(time.time() - t_all, 1),
        }
    }
    artifact.update(dict(sorted(out.items())))
    dest = ROOT / f"CORRECTNESS_FULL_r{args.round}.json"
    dest.write_text(json.dumps(artifact, indent=1))
    print(
        f"wrote {dest.name}: {len(queries)} queries, {n_exact} exact, "
        f"{n_rows} rows-only, {n_fail} FAIL, "
        f"{artifact['summary']['total_wall_sec']}s"
    )
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
