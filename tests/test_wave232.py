"""Wave-232: FS pattern table vs a dict replay, YoY vs python rollup,
interleave schedule round-robin properties."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_M_U = {"g1": (0.95, 0.10), "g2": (0.90, 0.20), "g3": (0.85, 0.25)}


def _weight(bits):
    tot = 0.0
    for g, (m, u) in zip(bits, _M_U.values()):
        tot += math.log2(m / u) if g else math.log2((1 - m) / (1 - u))
    return tot


def test_fellegi_sunter_pattern_replay(spark):
    rows = {(r.g1, r.g2, r.g3): r for r in QUERIES["model_fellegi_sunter"](spark, SF).collect()}
    cust = (
        table(spark, SF, "customer")
        .where("c_nationkey < 5")
        .select("c_custkey", "c_nationkey", "c_name", "c_mktsegment", "c_acctbal")
        .collect()
    )
    def a_rec(c):
        return (c.c_name[-3:], c.c_mktsegment, math.floor(c.c_acctbal / 1000))
    def b_rec(c):
        return (
            c.c_name[-3:],
            c.c_mktsegment,
            math.floor(c.c_acctbal / 1000) + (1 if c.c_custkey % 3 == 0 else 0),
        )
    by_nation = defaultdict(list)
    for c in cust:
        by_nation[c.c_nationkey].append(c)
    expected = defaultdict(lambda: [0, 0])
    for nk, cs in by_nation.items():
        bs = [c for c in cs if c.c_custkey % 20 == 0]
        for ca in cs:
            ra = a_rec(ca)
            for cb in bs:
                rb = b_rec(cb)
                bits = tuple(int(x == y) for x, y in zip(ra, rb))
                expected[bits][0] += 1
                expected[bits][1] += int(ca.c_custkey == cb.c_custkey)
    assert set(rows) == set(expected)
    for bits, (n, t) in expected.items():
        got = rows[bits]
        assert got.n_pairs == n
        assert got.n_true_matches == t
        w = _weight(bits)
        assert abs(got.match_weight - w) < 1e-6
        assert got.ruled_match == (w > 3.0)
    # full agreement must be ruled a match; full disagreement must not
    assert rows[(1, 1, 1)].ruled_match
    assert not rows[(0, 0, 0)].ruled_match


def test_yoy_growth_rollup(spark):
    rows = {r.month: r for r in QUERIES["temporal_yoy_growth"](spark, SF).collect()}
    orders = table(spark, SF, "orders").select("o_orderdate", "o_totalprice").collect()
    monthly = defaultdict(lambda: [0.0, 0])
    for o in orders:
        m = o.o_orderdate.strftime("%Y-%m")
        monthly[m][0] += o.o_totalprice
        monthly[m][1] += 1
    months = sorted(monthly)
    rev = {m: round(monthly[m][0], 2) for m in months}
    for i, m in enumerate(months):
        got = rows[m]
        assert got.n_orders == monthly[m][1]
        assert abs(got.revenue - rev[m]) < 0.02
        if i >= 1:
            assert abs(got.mom_growth - (got.revenue / rows[months[i - 1]].revenue - 1)) < 1e-6
        else:
            assert got.mom_growth is None
        if i >= 12:
            assert abs(got.yoy_growth - (got.revenue / rows[months[i - 12]].revenue - 1)) < 1e-6
        else:
            assert got.yoy_growth is None


def test_interleave_schedule_round_robin(spark):
    rows = sorted(
        QUERIES["pipeline_interleave_schedule"](spark, SF).collect(),
        key=lambda r: r.pos,
    )
    assert len(rows) == 100
    docs = table(spark, SF, "documents").select("doc_id", "source", "n_chars").collect()
    sources = sorted({d.source for d in docs})
    n_src = len(sources)
    # positions are exactly 1..100 (dense while all sources have docs)
    assert [r.pos for r in rows] == list(range(1, 101))
    # no source clumps: consecutive positions come from different sources
    for a, b in zip(rows, rows[1:]):
        assert a.source != b.source or n_src == 1
    # each block of n_src positions covers every source once
    for i in range(0, 100 - n_src + 1, n_src):
        block = rows[i : i + n_src]
        assert sorted(r.source for r in block) == sources
    # within a source, docs appear longest-first
    per_src = defaultdict(list)
    chars = {d.doc_id: d.n_chars for d in docs}
    for r in rows:
        per_src[r.source].append(chars[r.doc_id])
    for vals in per_src.values():
        assert vals == sorted(vals, reverse=True)
