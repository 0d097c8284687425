"""Wave-216: Shapley coverage vs the closed form (+efficiency axiom);
greedy set cover vs a python replay (+monotone marginals)."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_shapley_coverage_closed_form(spark):
    rows = {r["source"]: r for r in QUERIES["pipeline_shapley_coverage"](spark, SF).collect()}
    docs = table(spark, SF, "documents").select("source", "text").collect()
    owners = defaultdict(set)
    for d in docs:
        for t in d["text"].split(" "):
            owners[t].add(d["source"])
    phi = defaultdict(int)  # nano units, floor(1e9 / k) per token
    touched = defaultdict(int)
    unique = defaultdict(int)
    for t, srcs in owners.items():
        k = len(srcs)
        for s in srcs:
            phi[s] += 10**9 // k
            touched[s] += 1
            if k == 1:
                unique[s] += 1
    vocab = len(owners)
    assert set(rows) == set(phi)
    total_share = 0.0
    for s, r in rows.items():
        assert r["n_tokens_touched"] == touched[s]
        assert r["n_unique"] == unique[s]
        assert abs(r["shapley_coverage"] - phi[s] / 1e9) < 1e-6
        assert abs(r["shapley_share"] - phi[s] / (1e9 * vocab)) < 1e-6
        total_share += r["shapley_share"]
    # efficiency axiom: shares sum to ~1 (floor quantization loses < 1e-6
    # per token)
    assert abs(total_share - 1.0) < 1e-3


def test_greedy_set_cover_replay(spark):
    rows = sorted(
        QUERIES["pipeline_greedy_set_cover"](spark, SF).collect(),
        key=lambda r: r["pick_order"],
    )
    docs = table(spark, SF, "documents").select("source", "text").collect()
    by_source = defaultdict(set)
    for d in docs:
        w = d["text"].split(" ")
        for i in range(len(w) - 1):
            by_source[d["source"]].add(w[i] + " " + w[i + 1])
    covered = set()
    picked = set()
    for r in rows:
        best = None
        for s in sorted(by_source):
            if s in picked:
                continue
            marg = len(by_source[s] - covered)
            if best is None or (-marg, s) < best:
                best = (-marg, s)
        marg, s = -best[0], best[1]
        if marg == 0:
            break
        assert r["source"] == s
        assert r["marginal"] == marg
        covered |= by_source[s]
        picked.add(s)
        assert r["covered"] == len(covered)
    # diminishing returns: marginals are non-increasing (greedy property)
    margs = [r["marginal"] for r in rows]
    assert margs == sorted(margs, reverse=True)


def test_greedy_set_cover_job_bound(spark):
    """VERDICT r7 item 5: greedy set cover is hard-capped at 8 picks in
    code — assert the realized pick count respects that, and that the job
    count stays O(picks) (each pick costs a handful of jobs whose exact
    number floats with AQE broadcast/localCheckpoint decisions — observed
    35..71 across warm/cold sessions — but can never scale with rows)."""
    sc = spark.sparkContext
    sc.setJobGroup("setcover-bound", "job-count audit", interruptOnCancel=False)
    before = set(sc.statusTracker().getJobIdsForGroup("setcover-bound"))
    rows = QUERIES["pipeline_greedy_set_cover"](spark, SF).collect()
    after = set(sc.statusTracker().getJobIdsForGroup("setcover-bound"))
    sc.setJobGroup(None, None)
    picks = len(rows)
    assert 0 < picks <= 8, f"greedy loop ran {picks} picks (hard cap 8)"
    jobs = len(after - before)
    assert 0 < jobs <= 8 * 12 + 8, f"set cover launched {jobs} jobs (bound 104)"
