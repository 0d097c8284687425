"""Wave-231: WHT vs a numpy Hadamard recompute, tau_AP vs the textbook
Fraction formula, gap audit vs a sorted-list replay."""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_hadamard_energy_vs_numpy(spark):
    rows = {r.label: r for r in QUERIES["sim_hadamard_energy"](spark, SF).collect()}
    emb = table(spark, SF, "embeddings").select("vec_id", "label", "embedding").collect()
    # natural-order Hadamard from the bit-parity formula
    H = np.array(
        [[1 - 2 * (bin(k & j).count("1") % 2) for j in range(64)] for k in range(64)],
        dtype=np.int64,
    )
    agg = {}
    for r in emb:
        xq = np.round(np.array(r.embedding, dtype=np.float64) * 1000).astype(np.int64)
        c = H @ xq
        spec = int((c * c).sum())
        low = int((c[:16] * c[:16]).sum())
        e = int((xq * xq).sum())
        assert spec == 64 * e  # exact integer Parseval
        n, se, sl, ss = agg.get(r.label, (0, 0, 0, 0))
        agg[r.label] = (n + 1, se + e, sl + low, ss + spec)
    for label, (n, se, sl, ss) in agg.items():
        got = rows[label]
        assert got.n_vecs == n
        assert got.sum_energy == se
        assert got.sum_low_energy == sl
        assert abs(got.low_band_ratio - sl / ss) < 1e-6
        assert got.parseval_ok


def test_tau_ap_vs_fraction_formula(spark):
    row = QUERIES["model_tau_ap"](spark, SF).collect()[0]
    parts = (
        table(spark, SF, "part")
        .orderBy("p_partkey").limit(30)
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    s_order = sorted(parts, key=lambda p: (-p.p_retailprice, p.p_partkey))
    t_order = sorted(parts, key=lambda p: (-p.p_size, p.p_partkey))
    t_rank = {p.p_partkey: r for r, p in enumerate(t_order, start=1)}
    n = len(parts)
    acc = Fraction(0)
    for i in range(1, n):  # position i+1 in 1-based terms
        me = t_rank[s_order[i].p_partkey]
        c = sum(1 for j in range(i) if t_rank[s_order[j].p_partkey] < me)
        acc += Fraction(c, i)
    tau = Fraction(2, n - 1) * acc - 1
    assert row.n_items == n
    assert abs(row.tau_ap - float(tau)) < 1e-6
    assert -1.0 <= row.tau_ap <= 1.0


def test_gap_audit_vs_sorted_replay(spark):
    rows = {r.o_orderstatus: r for r in QUERIES["dq_sequence_gap_audit"](spark, SF).collect()}
    orders = table(spark, SF, "orders").select("o_orderstatus", "o_orderkey").collect()
    groups = {}
    for o in orders:
        groups.setdefault(o.o_orderstatus, []).append(o.o_orderkey)
    for st, keys in groups.items():
        keys.sort()
        deltas = [b - a for a, b in zip(keys, keys[1:])]
        got = rows[st]
        assert got.min_key == keys[0]
        assert got.max_key == keys[-1]
        assert got.n_present == len(keys)
        assert got.n_missing == keys[-1] - keys[0] + 1 - len(keys)
        assert got.n_gap_runs == sum(1 for d in deltas if d > 1)
        assert got.largest_gap == max([d - 1 for d in deltas if d > 1], default=0)
        # identity: missing keys = sum of gap-run widths
        assert got.n_missing == sum(d - 1 for d in deltas if d > 1)
