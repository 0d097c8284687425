"""Wave-297: richness constants vs a Counter-based python replay (plus the
published invariants); Coleman-Liau vs per-doc character counting."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_richness_constants_match_counter_replay(spark):
    rows = {r["source"]: r for r in QUERIES["text_honore_sichel"](spark, SF).collect()}
    freq: dict[str, Counter] = defaultdict(Counter)
    for d in table(spark, SF, "documents").select("source", "text").collect():
        freq[d["source"]].update(d["text"].split(" "))
    assert set(rows) == set(freq)
    for src, cnt in freq.items():
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for f in cnt.values() if f == 1)
        v2 = sum(1 for f in cnt.values() if f == 2)
        r = rows[src]
        assert (r["n_tokens"], r["vocab"], r["v1"], r["v2"]) == (n, v, v1, v2)
        assert abs(r["honore_r"] - 100 * math.log(n) / (1 - v1 / v)) < 1e-3
        assert abs(r["sichel_s"] - v2 / v) < 1e-6
        assert abs(r["brunet_w"] - n ** (v**-0.165)) < 1e-3
        # published reading: Brunet W sits in the ~10-20 band for natural
        # text and V1 <= V <= N always
        assert v1 <= v <= n
        assert r["brunet_w"] > 1


def test_coleman_liau_matches_char_counts(spark):
    rows = {r["doc_id"]: r for r in QUERIES["text_coleman_liau"](spark, SF).collect()}
    for d in table(spark, SF, "documents").select("doc_id", "text").collect():
        letters = sum(1 for ch in d["text"] if ch.isalpha() and ord(ch) < 128)
        words = len(d["text"].split(" "))
        sents = max(sum(d["text"].count(p) for p in ".!?"), 1)
        cli = 0.0588 * (100 * letters / words) - 0.296 * (100 * sents / words) - 15.8
        r = rows[d["doc_id"]]
        assert r["letters"] == letters
        assert r["n_words"] == words
        assert r["n_sentences"] == sents
        assert abs(r["coleman_liau"] - cli) < 1e-3
