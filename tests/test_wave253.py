"""Wave-253: prefix-cache savings vs a dict replay, speculative
acceptance vs a Counter-based bigram replay plus the Leviathan
expected-tokens formula's analytic bounds."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_prefix_cache_savings_replay(spark):
    rows = {r.depth: r for r in QUERIES["pipeline_prefix_cache_savings"](spark, SF).collect()}
    docs = [r.text.split(" ") for r in table(spark, SF, "documents").collect()]
    for depth in (2, 5, 10):
        groups = defaultdict(lambda: [0, 0])
        for t in docs:
            plen = min(depth, len(t))
            key = " ".join(t[:depth])
            groups[key][0] += 1
            groups[key][1] = plen
        saved = sum((n - 1) * plen for n, plen in groups.values())
        total = sum(n * plen for n, plen in groups.values())
        r = rows[depth]
        assert r.n_groups == len(groups)
        assert r.docs_sharing == sum(n for n, _ in groups.values() if n >= 2)
        assert r.saved_tokens == saved
        assert abs(r.saved_fraction - round(saved / total, 6)) < 1e-9
    # deeper prefixes can only share less
    assert rows[2].saved_fraction >= rows[5].saved_fraction >= rows[10].saved_fraction


def test_speculative_acceptance_replay(spark):
    row = QUERIES["pipeline_speculative_acceptance"](spark, SF).collect()[0]
    docs = {r.doc_id: r.text.split(" ") for r in table(spark, SF, "documents").collect()}
    big = defaultdict(Counter)
    for did, t in docs.items():
        if did % 2 == 0:
            for w, nxt in zip(t, t[1:]):
                big[w][nxt] += 1
    draft = {
        w: min((c for c in cnt.items()), key=lambda kv: (-kv[1], kv[0]))[0]
        for w, cnt in big.items()
    }
    n_pairs = n_acc = 0
    for did, t in docs.items():
        if did % 2 == 1:
            for w, nxt in zip(t, t[1:]):
                n_pairs += 1
                if draft.get(w) == nxt:
                    n_acc += 1
    p = n_acc / n_pairs
    assert row.n_pairs == n_pairs and row.n_accept == n_acc
    assert abs(row.acceptance - round(p, 6)) < 1e-9
    expected = (1 - p ** 5) / (1 - p)
    assert abs(row.expected_tokens_per_step - round(expected, 6)) < 1e-4
    # the formula's bounds: between 1 (nothing accepted) and gamma+1
    assert 1 <= row.expected_tokens_per_step <= 5
