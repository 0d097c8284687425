"""r12 optimization helpers: per-query timing (count + noop sink, guide
§1.4), formatted-plan dumps into plans/r12/, and a stage-level breakdown
via the UI REST API (task counts, launch overhead vs compute).

Usage (fresh process so spark.ui.enabled can be set):
    python - <<'EOF'
    from tools.r12.profile_query import session, prof, stages
    spark = session()
    prof(spark, "dedup_minhash_lsh_exact")
    stages(spark, "dedup_minhash_lsh_exact")
    EOF
"""

from __future__ import annotations

import sys
import time
import urllib.request
import json

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _registry():
    from data_ingestor_web_app_spark import registry

    registry.load_all()
    return registry


def session(extra: dict | None = None):
    from data_ingestor_web_app_spark.session import get_spark

    conf = {"spark.ui.enabled": "true"}
    conf.update(extra or {})
    spark = get_spark("r12-prof", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def timed(fn, n=3):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return [round(t, 3) for t in out]


def prof(spark, name: str, n: int = 3, sf_dir: str = SF_DIR) -> dict:
    reg = _registry()
    spark.sparkContext.setJobDescription(f"r12-prof:{name}")
    noops = timed(
        lambda: reg.QUERIES[name](spark, sf_dir)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n,
    )
    spark.sparkContext.setJobDescription(None)
    res = {"query": name, "noop_s": noops}
    print(res)
    return res


def _api(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def stages(spark, name: str, sf_dir: str = SF_DIR) -> dict:
    """Run query once under a job group and report per-stage task counts,
    wall, and total task time — separates scheduling overhead (many tiny
    tasks) from compute."""
    reg = _registry()
    sc = spark.sparkContext
    before_jobs = {j["jobId"] for j in _api(spark, "jobs")}
    sc.setJobGroup(f"r12-{name}", name)
    t0 = time.perf_counter()
    reg.QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = [j for j in _api(spark, "jobs") if j["jobId"] not in before_jobs]
    stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
    rows = []
    for sid in stage_ids:
        try:
            infos = _api(spark, f"stages/{sid}")
        except Exception:
            continue
        for s in infos:
            if s["status"] == "SKIPPED":
                continue
            rows.append(
                {
                    "stage": sid,
                    "tasks": s["numCompleteTasks"],
                    "run_ms": s.get("executorRunTime", 0),
                    "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                    "sched_delay": None,
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "shuffle_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "shuffle_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "name": s["name"][:60],
                }
            )
    res = {
        "query": name,
        "wall_s": round(wall, 3),
        "n_jobs": len(jobs),
        "n_stages": len(rows),
        "n_tasks": sum(r["tasks"] for r in rows),
        "task_time_s": round(sum(r["run_ms"] for r in rows) / 1000, 2),
        "cpu_time_s": round(sum(r["cpu_ms"] for r in rows) / 1000, 2),
    }
    print(json.dumps(res))
    for r in sorted(rows, key=lambda r: -r["run_ms"])[:12]:
        print(
            f"  stage {r['stage']:>4} tasks={r['tasks']:>3} run={r['run_ms']:>6}ms "
            f"cpu={r['cpu_ms']:>6}ms in={r['input_mb']:>7}MB "
            f"sr={r['shuffle_r_mb']:>7}MB sw={r['shuffle_w_mb']:>7}MB  {r['name']}"
        )
    return res


def plan_to_file(spark, name: str, tag: str, sf_dir: str = SF_DIR) -> str:
    reg = _registry()
    df = reg.QUERIES[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"/root/repo/plans/r12/{name}_{tag}.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(
        f"{path}: {txt.count('Exchange')} Exchange, "
        f"SMJ={txt.count('SortMergeJoin')}, BHJ={txt.count('BroadcastHashJoin')}, "
        f"scans={txt.count('Scan parquet')}, py={txt.count('EvalPython') + txt.count('MapInPandas') + txt.count('FlatMapGroupsInPandas')}"
    )
    return path
