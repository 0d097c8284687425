"""r11 optimization helper: profile gate-wall queries at sf0.01, splitting
Spark-side cost (build + noop write, guide §1.4) from DuckDB-oracle cost.

Usage: python tools/r11/gate_profile.py name1 name2 ...
Prints one line per query: spark_build_s spark_noop_s duckdb_s
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SF = "/root/testdata/sf0.01"


def main(names: list[str]) -> None:
    from data_ingestor_web_app_spark import registry
    from data_ingestor_web_app_spark.session import get_spark

    registry.load_all()
    spark = get_spark()

    con = duckdb.connect()
    for fn in os.listdir(SF):
        if fn.endswith(".parquet"):
            con.execute(
                f"CREATE VIEW {fn[:-8]} AS"
                f" SELECT * FROM read_parquet('{SF}/{fn}')"
            )

    # one warmup query so JVM/codegen startup is not charged to the first name
    registry.QUERIES["agg_global"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    print(f"{'query':36s} {'build_s':>8s} {'noop_s':>8s} {'duck_s':>8s}")
    for name in names:
        spark.sparkContext.setJobDescription(f"r11-gateprof:{name}")
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, SF)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sql = registry.ORACLES.get(name)
        if sql:
            t3 = time.perf_counter()
            con.execute(sql).fetchall()
            t4 = time.perf_counter()
            duck = t4 - t3
        else:
            duck = float("nan")
        print(
            f"{name:36s} {t1 - t0:8.2f} {t2 - t1:8.2f} {duck:8.2f}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main(sys.argv[1:])
