"""r11 optimization helper: time a query with both the bench action
(df.count()) and the noop sink (guide §1.4), and dump its formatted plan.

Usage (inside a live REPL or via exec):
    from tools.r11.profile_query import prof, plan_to_file
    prof(spark, "sim_mmd_poly")                  # timing
    plan_to_file(spark, "sim_mmd_poly", "before")  # plans/r11/<q>_before.txt
"""

from __future__ import annotations

import time

SF_DIR = "/root/testdata/sf0.1"


def _registry():
    from data_ingestor_web_app_spark import registry

    registry.load_all()
    return registry


def timed(fn, n=3):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return [round(t, 3) for t in out]


def prof(spark, name: str, n: int = 3, sf_dir: str = SF_DIR) -> dict:
    reg = _registry()
    spark.sparkContext.setJobDescription(f"r11-prof:{name}")
    counts = timed(lambda: reg.QUERIES[name](spark, sf_dir).count(), n)
    noops = timed(
        lambda: reg.QUERIES[name](spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n,
    )
    spark.sparkContext.setJobDescription(None)
    res = {"query": name, "count_s": counts, "noop_s": noops}
    print(res)
    return res


def plan_to_file(spark, name: str, tag: str, sf_dir: str = SF_DIR) -> str:
    reg = _registry()
    df = reg.QUERIES[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"/root/repo/plans/r11/{name}_{tag}.txt"
    with open(path, "w") as f:
        f.write(txt)
    n_exch = txt.count("Exchange")
    print(f"{path}: {n_exch} Exchange, SMJ={txt.count('SortMergeJoin')}, "
          f"BHJ={txt.count('BroadcastHashJoin')}, py={txt.count('EvalPython')+txt.count('MapInPandas')+txt.count('MapInArrow')}")
    return txt
