"""Wave-89 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_modularity_matches_bruteforce(spark):
    r = QUERIES["graph_modularity"](spark, SF_SMALL).first()
    assert -0.5 <= r.modularity <= 1.0
    # brute-force on the small fixture
    sp = (
        table(spark, SF_SMALL, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_part = {}
    for row in sp:
        by_part.setdefault(row.l_partkey, []).append(row.l_suppkey)
    edges = set()
    for supps in by_part.values():
        ss = sorted(set(supps))
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges.add((ss[i], ss[j]))
    nation = {
        row.s_suppkey: row.s_nationkey
        for row in table(spark, SF_SMALL, "supplier").collect()
    }
    m = len(edges)
    assert r.n_edges == m
    e_c, d_c = {}, {}
    for a, b in edges:
        na, nb = nation[a], nation[b]
        if na == nb:
            e_c[na] = e_c.get(na, 0) + 1
        d_c[na] = d_c.get(na, 0) + 1
        d_c[nb] = d_c.get(nb, 0) + 1
    q = sum(e_c.get(c, 0) / m - (d / (2 * m)) ** 2 for c, d in d_c.items())
    assert abs(r.modularity - q) < 1e-5


def test_horvitz_thompson_unbiasedness_mechanics(spark):
    r = QUERIES["sample_horvitz_thompson"](spark, SF_SMALL).first()
    assert 0 < r.n_sampled < r.n_frame
    assert r.true_total_cents != 0
    # HT total with weights {2,4,10} is an integer multiple combination
    assert isinstance(r.ht_total_cents, int)
    # estimator is consistent: rel error shrinks with n; loose sanity gate
    assert r.rel_error < 1.5
    expected_err = abs(r.ht_total_cents - r.true_total_cents) / abs(r.true_total_cents)
    assert abs(r.rel_error - expected_err) < 1e-5


def test_bloom_filter_fp_rate_theory(spark):
    r = QUERIES["maintenance_bloom_filter_audit"](spark, SF_SMALL).first()
    assert 0 < r.fill_ratio < 1
    assert r.bits_set <= 3 * r.n_inserted
    assert 0 <= r.fp_rate <= 1
    # realized FP rate should be near fill_ratio^k for k=3 (within a
    # generous factor — small probe sets are noisy)
    theory = r.fill_ratio ** 3
    assert r.fp_rate <= max(5 * theory, 0.02) + 3 / max(r.n_probes, 1)
