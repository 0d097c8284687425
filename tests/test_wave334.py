"""Wave-334: the Lowrance-Wagner DP vs DuckDB's builtin on canonical
hard cases + fixture pairs; Huffman vs a python heap replay."""

from __future__ import annotations

import heapq
import math

import duckdb

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.operators.wave334 import _dl_distance
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dl_dp_matches_duckdb_builtin():
    cases = [
        ("CA", "ABC"),  # unrestricted DL = 2, OSA would say 3
        ("ab", "ba"),
        ("kitten", "sitting"),
        ("", "abc"),
        ("abc", ""),
        ("same", "same"),
        ("abcdef", "badcfe"),
        ("a cat", "an act"),
        ("Customer#000000042", "Customer#000000024"),
    ]
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert _dl_distance(a, b) == want, (a, b)
    assert _dl_distance("CA", "ABC") == 2


def test_dl_query_columns(spark):
    rows = QUERIES["fn_damerau_levenshtein"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["transposition_gain"] == r["lev_distance"] - r["dl_distance"]
        assert 0 <= r["dl_distance"] <= r["lev_distance"]


def test_huffman_vs_heap_replay(spark):
    counts = {
        r["event_type"]: r["count"]
        for r in table(spark, SF, "events").groupBy("event_type").count().collect()
    }
    # same greedy policy: (weight, min-symbol representative)
    heap = [(w, s, frozenset([s])) for s, w in counts.items()]
    heapq.heapify(heap)
    depth = {s: 0 for s in counts}
    while len(heap) > 1:
        w1, r1, m1 = heapq.heappop(heap)
        w2, r2, m2 = heapq.heappop(heap)
        for s in m1 | m2:
            depth[s] += 1
        heapq.heappush(heap, (w1 + w2, min(r1, r2), m1 | m2))
    got = {
        r["event_type"]: r
        for r in QUERIES["text_huffman_code_lengths"](spark, SF).collect()
    }
    n = sum(counts.values())
    for s, w in counts.items():
        assert got[s]["votes"] == w
        assert got[s]["code_len"] == depth[s]
    avg = sum(counts[s] * depth[s] for s in counts) / n
    h = sum(w * math.log2(n / w) for w in counts.values()) / n
    any_row = next(iter(got.values()))
    assert abs(any_row["avg_code_len"] - avg) < 1e-6
    assert abs(any_row["entropy_bits"] - h) < 1e-6
    # complete prefix code: Kraft equality; optimality: H <= L < H+1
    assert abs(any_row["kraft_sum"] - 1.0) < 1e-9
    assert h - 1e-9 <= avg < h + 1
