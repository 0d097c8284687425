"""Dump .explain('formatted') plans for the r11-touched queries.

Usage: python tools/r11/dump_r11_plans.py <repo_root> <tag> [sf_dir]
Writes /root/repo/plans/r11/<query>_<tag>.txt for every query in TOUCHED
that exists in <repo_root>'s registry. Run once against the pre-round
worktree (tag=before) and once against HEAD (tag=after).
"""

from __future__ import annotations

import os
import sys

# Batch queries whose SPARK plan changed in the r11 optimization round.
# (Oracle-SQL-only rewrites keep their Spark plan; streaming replays have
# no single batch plan — both are documented in OPTIMIZATION_r11.md.)
TOUCHED = [
    "sim_mmd_poly",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_exact",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "sim_kmeans_iter",
    "dedup_embedding",
    "dedup_near",
    "sim_sinkhorn_ot",
    "opt_wagner_whitin",
    "model_plackett_luce",
    "pipeline_lsh_tuning_curve",
    "sim_random_projection_jl",
    "agg_spearman_rho",
    "events_hazard_profile",
    "model_kde_grid",
    "model_km_greenwood",
    "model_item_analysis_kr20",
    "events_erlang_c_staffing",
    "events_kaplan_meier",
    "model_item_cf_cosine",
    "sim_kernel_herding",
    "model_head_tail_breaks",
    "graph_ppr_unrolled",
    "dedup_family_sizes",
    "text_huffman_code_lengths",
    "events_voptimal_histogram",
    "events_burst_kleinberg",
    "events_che_lru_hit",
    "agg_median_polish",
    "sim_pq_adc",
    "sim_rerank_mmr",
    "graph_bfs_layers",
    "graph_diameter_double_sweep",
]

OUT_DIR = "/root/repo/plans/r11"


def main() -> None:
    repo_root, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo_root)
    from data_ingestor_web_app_spark import registry
    from data_ingestor_web_app_spark.session import get_spark

    registry.load_all()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in TOUCHED:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not registered here", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"r11-plan:{name}:{tag}")
        try:
            df = fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            txt = f"PLAN DUMP FAILED: {ex}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(
            f"{name}_{tag}: Exchange={txt.count('Exchange')} "
            f"SMJ={txt.count('SortMergeJoin')} "
            f"BHJ={txt.count('BroadcastHashJoin')} "
            f"BNLJ={txt.count('BroadcastNestedLoop')} "
            f"Py={txt.count('EvalPython') + txt.count('MapInPandas') + txt.count('FlatMapGroupsInPandas')} "
            f"Union={txt.count('Union')} Scan={txt.count('Scan parquet')}",
            flush=True,
        )


if __name__ == "__main__":
    main()
