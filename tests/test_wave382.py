"""Wave-382 pytests: Knox space-time interaction + LZ76 complexity.

Independent-replay discipline (registry docstring): LZ76 is recomputed
here by a THIRD implementation (a from-scratch set-of-phrases parser, not
the query's Kaspar-Schuster loop and not the oracle CTE); Knox's pair
counts are recomputed from the raw per-user points in pure Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _lz76_reference(s: str) -> int:
    """Phrase-list LZ76 parse: grow the candidate until it is NOT a
    substring of everything before its last char, then cut."""
    n = len(s)
    phrases = 0
    i = 0
    while i < n:
        length = 1
        while i + length <= n and s[i : i + length] in s[: i + length - 1]:
            length += 1
        phrases += 1
        i += length
    return phrases


def test_lz76_matches_independent_parser(spark):
    rows = QUERIES["text_lz76_complexity"](spark, SF).collect()
    assert rows
    docs = {
        r["doc_id"]: r["s"]
        for r in table(spark, SF, "documents")
        .where((F.col("doc_id") < 40) & (F.length("text") >= 4))
        .select("doc_id", F.substring(F.lower("text"), 1, 60).alias("s"))
        .collect()
    }
    assert {r["doc_id"] for r in rows} == set(docs)
    for r in rows:
        s = docs[r["doc_id"]]
        assert r["n_chars"] == len(s)
        assert r["lz_phrases"] == _lz76_reference(s), s
        # sanity bounds: 1 <= c <= n, repetitive strings score low
        assert 1 <= r["lz_phrases"] <= r["n_chars"]


def test_lz76_known_strings():
    # canonical examples: constant, alternating, and all-distinct symbols
    assert _lz76_reference("aaaaaaaa") == 2  # a | aaaaaaa
    assert _lz76_reference("abababab") == 3  # a | b | ababab
    assert _lz76_reference("abcdefgh") == 8  # every char is new
    # the query's Kaspar-Schuster loop agrees with the phrase-list parse
    from data_ingestor_web_app_spark.operators.wave382 import _lz76_phrases

    for s in ["aaaaaaaa", "abababab", "abcdefgh", "abcabcabcabc", "a", "ab",
              "mississippi", "the the the the"]:
        assert _lz76_phrases(s) == _lz76_reference(s), s


def test_knox_pair_counts_match_bruteforce(spark):
    row = QUERIES["spatial_knox_spacetime"](spark, SF).first()
    pts = [
        (r["x"], r["y"], r["t"])
        for r in table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            (F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) % 32)
            .cast("long")
            .alias("x"),
            (F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)) % 32)
            .cast("long")
            .alias("y"),
            F.hour(F.min("ts")).cast("long").alias("t"),
        )
        .collect()
    ]
    n = len(pts)
    x = s = t = 0
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            (ax, ay, at), (bx, by, bt) = pts[i], pts[j]
            sp = (ax - bx) ** 2 + (ay - by) ** 2 <= 16
            tm = min(abs(at - bt), 24 - abs(at - bt)) <= 3
            s += sp
            t += tm
            x += sp and tm
    assert row["n_pts"] == n
    assert row["n_pairs_space"] == s
    assert row["n_pairs_time"] == t
    assert row["n_pairs_spacetime"] == x
    # interaction count can never exceed either marginal
    assert x <= min(s, t)
    # ordered-pair counts are symmetric, hence even
    assert s % 2 == 0 and t % 2 == 0 and x % 2 == 0
