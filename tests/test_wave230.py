"""Wave-230: CC histogram vs a pure-python union-find, survivorship vs a
dict replay, ERR vs the textbook cascade formula in exact fractions."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from fractions import Fraction

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _link(k: int) -> bool:
    return int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 10 < 7


def test_connected_components_vs_union_find(spark):
    rows = {
        r.component_size: r.n_components
        for r in QUERIES["graph_connected_components"](spark, SF).collect()
    }
    keys = sorted(
        r.c_custkey for r in table(spark, SF, "customer").select("c_custkey").collect()
    )
    parent = {k: k for k in keys}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kset = set(keys)
    for k in keys:
        if _link(k) and k + 1 in kset:
            parent[find(k)] = find(k + 1)
    sizes = Counter(Counter(find(k) for k in keys).values())
    assert rows == dict(sizes)
    # the histogram must account for every node
    assert sum(s * n for s, n in rows.items()) == len(keys)


def test_survivorship_policy_replay(spark):
    rows = QUERIES["pipeline_dedup_survivorship"](spark, SF).collect()
    docs = table(spark, SF, "documents").select(
        "doc_id", "text", "source", "n_chars"
    ).collect()
    clusters = defaultdict(list)
    for d in docs:
        clusters[hashlib.md5(d.text.encode()).hexdigest()].append(d)
    expected = {k: v for k, v in clusters.items() if len(v) > 1}
    assert {r.ckey for r in rows} == set(expected)
    for r in rows:
        members = expected[r.ckey]
        assert r.n_members == len(members)
        assert r.first_doc_id == min(m.doc_id for m in members)
        # policy: longest n_chars wins, ties -> lowest doc_id
        best = min(members, key=lambda m: (-m.n_chars, m.doc_id))
        assert r.survivor_doc_id == best.doc_id
        assert r.sources == ",".join(sorted({m.source for m in members}))


def test_err_matches_exact_fraction_cascade(spark):
    rows = {r.qid: r.err_10 for r in QUERIES["model_err_retrieval"](spark, SF).collect()}
    ev = (
        table(spark, SF, "events")
        .where("user_id IS NOT NULL AND user_id < 20")
        .select("user_id", "event_type")
        .collect()
    )
    counts = Counter((r.user_id, r.event_type) for r in ev)
    per_q = defaultdict(list)
    for (uid, et), n in counts.items():
        per_q[uid].append((et, n))
    for qid, items in per_q.items():
        ranked = sorted(items, key=lambda t: (-t[1], t[0]))[:10]
        p_not_stopped = Fraction(1)
        err = Fraction(0)
        for r, (_, n) in enumerate(ranked, start=1):
            g = n % 4
            rel = Fraction(2**g - 1, 8)
            err += Fraction(1, r) * rel * p_not_stopped
            p_not_stopped *= 1 - rel
        assert abs(rows[qid] - float(err)) < 5e-7, (qid, rows[qid], float(err))
