"""Wave-317: postings bit costs vs int.bit_length replays of the code
definitions; shard balance vs an md5 replay and the theory bound."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _gamma_bits(g: int) -> int:
    return 2 * (g.bit_length() - 1) + 1


def _delta_bits(g: int) -> int:
    lg = g.bit_length() - 1
    return lg + 2 * ((lg + 1).bit_length() - 1) + 1


def test_postings_compression_matches_bitlength_replay(spark):
    row = QUERIES["pipeline_postings_compression"](spark, SF).first()
    post = defaultdict(list)
    for r in table(spark, SF, "documents").select("doc_id", "text").collect():
        for w in set(r["text"].split(" ")):
            post[w].append(r["doc_id"])
    gaps = []
    for docs in post.values():
        prev = -1
        for d in sorted(docs):
            gaps.append(d - prev)
            prev = d
    assert row["n_gaps"] == len(gaps)
    assert abs(row["mean_gap"] - sum(gaps) / len(gaps)) < 1e-3
    gamma = sum(_gamma_bits(g) for g in gaps)
    delta = sum(_delta_bits(g) for g in gaps)
    assert row["gamma_bits"] == gamma
    assert row["delta_bits"] == delta
    k = max(round(math.log2(0.69 * sum(gaps) / len(gaps))), 0)
    assert row["rice_k"] == k
    rice = sum((g - 1) // 2**k + 1 + k for g in gaps)
    assert row["rice_bits"] == rice
    # unary coding floor: every scheme spends at least 1 bit per gap
    for col in ("gamma_bits", "delta_bits", "rice_bits"):
        assert row[col] >= len(gaps)


def test_shard_balance_matches_md5_replay(spark):
    row = QUERIES["pipeline_shard_balance"](spark, SF).first()
    per = defaultdict(lambda: [0, 0])
    for r in table(spark, SF, "documents").select("doc_id", "n_chars").collect():
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 64
        per[h][0] += 1
        per[h][1] += r["n_chars"]
    m = sum(d for d, _ in per.values())
    max_docs = max(d for d, _ in per.values())
    mean_docs = m / len(per)
    max_chars = max(c for _, c in per.values())
    mean_chars = sum(c for _, c in per.values()) / len(per)
    assert row["shards_used"] == len(per)
    assert row["n_docs"] == m
    assert row["max_docs"] == max_docs
    assert abs(row["doc_imbalance"] - max_docs / mean_docs) < 1e-5
    assert abs(row["char_imbalance"] - max_chars / mean_chars) < 1e-5
    bound = m / 64 + math.sqrt(2 * m * math.log(64) / 64)
    assert abs(row["raab_steger_bound"] - bound) < 1e-3
    assert row["within_theory"] == (max_docs <= bound)
