"""Wave-257: block entropies vs a Counter replay (plus the conditioning
inequality h1 >= h2 >= h3), novelty vs a set-membership replay (plus
the monotone-in-n property: longer grams are never less novel)."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return {
        r.doc_id: r.text.split(" ")
        for r in table(spark, SF, "documents").collect()
    }


def _grams(t, n):
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def test_block_entropy_ladder_replay(spark):
    rows = {r.n: r for r in QUERIES["text_block_entropy_ladder"](spark, SF).collect()}
    docs = _docs(spark)
    hs = {}
    for n in (1, 2, 3):
        cnt = Counter()
        for t in docs.values():
            cnt.update(_grams(t, n))
        tot = sum(cnt.values())
        h = -sum((c / tot) * math.log(c / tot) for c in cnt.values())
        hs[n] = h
        r = rows[n]
        assert r.vocab_n == len(cnt)
        assert r.n_grams == tot
        assert abs(r.block_entropy - round(h, 6)) < 1e-5
        prev = hs.get(n - 1, 0.0)
        assert abs(r.cond_entropy - round(h - prev, 6)) < 1e-5
    # conditioning reduces entropy: h1 >= h2 >= h3
    h1 = hs[1]
    h2 = hs[2] - hs[1]
    h3 = hs[3] - hs[2]
    assert h1 >= h2 - 1e-9 >= 0 and h2 >= h3 - 1e-9 >= 0


def test_ngram_novelty_replay(spark):
    rows = {r.n: r for r in QUERIES["text_ngram_novelty"](spark, SF).collect()}
    docs = _docs(spark)
    for n in (1, 2, 3):
        train = set()
        for did, t in docs.items():
            if did % 2 == 0:
                train.update(_grams(t, n))
        n_test = n_novel = 0
        for did, t in docs.items():
            if did % 2 == 1:
                for g in _grams(t, n):
                    n_test += 1
                    n_novel += g not in train
        r = rows[n]
        assert r.n_test_grams == n_test
        assert r.n_novel == n_novel
        assert abs(r.novelty_rate - round(n_novel / n_test, 6)) < 1e-9
    # a novel (n-1)-gram makes both containing n-grams novel: rate rises
    assert rows[1].novelty_rate <= rows[2].novelty_rate <= rows[3].novelty_rate
