"""Wave-159: the hash-exact MinHash+LSH variant — no false positives,
recall vs the exact quadratic baseline, and agreement with the production
xxhash64 variant's within-group (exact-duplicate) pairs."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES


def test_minhash_exact_recall_and_no_false_positives(spark, sf_small):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_near"](spark, sf_small).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in QUERIES["dedup_minhash_lsh_exact"](spark, sf_small).collect()
    }
    # verification step guarantees no false positives
    assert set(got) <= set(exact)
    if exact:
        recall = len(set(got) & set(exact)) / len(exact)
        assert recall >= 0.9, f"recall {recall:.3f} below 0.9"
    # reported Jaccards agree with the exact baseline on shared pairs
    for pair in got:
        assert abs(got[pair] - exact[pair]) < 1e-6


def test_minhash_exact_within_groups_match_production_variant(spark, sf_small):
    """Exact-duplicate (jaccard=1.0) pairs do not depend on the hash family
    — both variants must emit the identical within-group pair set."""
    prod = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_small).collect()
        if r["jaccard"] == 1.0
    }
    ours = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh_exact"](spark, sf_small).collect()
        if r["jaccard"] == 1.0
    }
    assert prod == ours
