"""Wave-186: Wilcoxon vs scipy-free closed form; divergence axioms;
polynomial-MMD moment decomposition vs the naive pairwise kernel sum."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_wilcoxon_matches_numpy_recompute(spark):
    row = QUERIES["agg_wilcoxon_signed_rank"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(hour(ts) < 12 AS INT) AS am"
    ).collect()
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for r in ev:
        per[r["d"]][r["am"]] += 1  # [pm, am]
    diffs = np.array([pm - am for pm, am in (tuple(v) for v in per.values()) if pm != am])
    absd = np.abs(diffs)
    order = np.argsort(absd, kind="stable")
    # average ranks with ties
    ranks = np.empty(len(absd))
    sorted_abs = absd[order]
    i = 0
    while i < len(sorted_abs):
        j = i
        while j < len(sorted_abs) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n = len(diffs)
    w_plus = float(ranks[diffs > 0].sum())
    _, tcounts = np.unique(absd, return_counts=True)
    tsum = float((tcounts.astype(np.int64) ** 3 - tcounts).sum())
    mu = n * (n + 1) / 4.0
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0
    assert row["n_pairs"] == n
    assert abs(row["w_plus"] - w_plus) < 1e-9
    assert abs(row["z_stat"] - (w_plus - mu) / math.sqrt(var)) < 1e-5


def test_divergence_axioms_and_global_row(spark):
    rows = QUERIES["text_lang_divergence"](spark, SF).collect()
    docs = table(spark, SF, "documents")
    assert {r["source"] for r in rows} == {
        r["source"] for r in docs.select("source").distinct().collect()
    }
    for r in rows:
        # KL >= 0 (Gibbs), JS bounded by ln 2, Hellinger/TV in [0,1]
        assert r["kl_pq"] >= -1e-9, r
        assert -1e-9 <= r["js_div"] <= math.log(2) + 1e-9, r
        assert -1e-9 <= r["hellinger"] <= 1.0 + 1e-9, r
        assert -1e-9 <= r["tv_dist"] <= 1.0 + 1e-9, r
        # Pinsker: TV <= sqrt(KL/2) (holds for smoothed dists)
        assert r["tv_dist"] <= math.sqrt(max(r["kl_pq"], 0) / 2) + 1e-6, r


def test_mmd_poly_equals_naive_pairwise(spark):
    rows = {r["label"]: r for r in QUERIES["sim_mmd_poly"](spark, SF).collect()}
    emb = table(spark, SF, "embeddings").select("label", "embedding").collect()
    # quantize exactly as the query does, then brute-force the V-statistic
    X = {}
    for r in emb:
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
        X.setdefault(r["label"], []).append(q / 1e6)
    allv = np.array([v for vs in X.values() for v in vs])
    d = 64

    def kmean(A, B):
        G = (A @ B.T / d + 1.0) ** 2
        return G.mean()

    for lab in sorted(X)[:3]:  # 3 labels suffice; brute force is O(N^2)
        A = np.array(X[lab])
        mask = np.ones(len(allv), dtype=bool)
        # rebuild "rest" by removing this label's rows (order-independent)
        R = np.array([v for l2, vs in X.items() if l2 != lab for v in vs])
        mmd2 = kmean(A, A) + kmean(R, R) - 2 * kmean(A, R)
        row = rows[lab]
        assert row["n_in"] == len(A) and row["n_rest"] == len(R)
        assert abs(row["mmd2"] - mmd2) < 1e-5, (lab, row["mmd2"], mmd2)
        assert mask.all()


def test_mmd_poly_plan_has_no_pairwise_join(spark):
    df = QUERIES["sim_mmd_poly"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only joins are on the 4096-row moment frames (broadcast)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
