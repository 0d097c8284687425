"""Wave-189: consistent-hashing movement contract; Theil U vs direct
entropy recompute; odds-ratio algebra."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_consistent_hash_movement_contract(spark):
    rows = QUERIES["pipeline_consistent_hash_shards"](spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # THE consistent-hashing property: a key moves on expansion only if
    # the new shard claims it — nothing reshuffles between old shards.
    for r in rows:
        assert r["n_moved"] == r["n_moved_to_new"], r
    moved = sum(r["n_moved"] for r in rows)
    # expected fraction ~1/9; allow generous sampling slack
    assert moved / n_docs < 0.35
    # spot-check one assignment against a pure-python ring walk
    from data_ingestor_web_app_spark.operators.wave189 import _K8

    import bisect

    ps = [p for p, _ in _K8]
    ss = [s for _, s in _K8]
    pos = int(hashlib.md5(b"1").hexdigest()[:14], 16)
    i = bisect.bisect_left(ps, pos)
    expected = ss[i] if i < len(ps) else ss[0]
    by_shard = {r["shard"]: r for r in rows}
    assert expected in by_shard  # the shard exists and got docs


def test_theil_u_matches_direct_entropy(spark):
    row = QUERIES["model_theil_u"](spark, SF).collect()[0]
    rows = table(spark, SF, "documents").select("source", "lang").collect()
    from collections import Counter

    joint = Counter((r["source"], r["lang"]) for r in rows)
    n = sum(joint.values())

    def h(counter):
        return -sum(c / n * math.log(c / n) for c in counter.values())

    hx = h(Counter(k[0] for k in joint.elements()))
    hy = h(Counter(k[1] for k in joint.elements()))
    hxy = h(joint)
    mi = hx + hy - hxy
    assert abs(row["h_source"] - hx) < 1e-5
    assert abs(row["h_lang"] - hy) < 1e-5
    assert abs(row["h_joint"] - hxy) < 1e-5
    assert abs(row["u_lang_given_source"] - mi / hy) < 1e-5
    assert abs(row["u_source_given_lang"] - mi / hx) < 1e-5
    assert 0 <= row["u_lang_given_source"] <= 1 + 1e-9


def test_odds_ratio_cells_and_ci(spark):
    rows = QUERIES["agg_odds_ratio_woolf"](spark, SF).collect()
    n = table(spark, SF, "events").count()
    for r in rows:
        assert r["a"] + r["b"] + r["c"] + r["d"] == n
        orr = r["a"] * r["d"] / (r["b"] * r["c"])
        assert abs(r["odds_ratio"] - orr) < 1e-5
        se = math.sqrt(1 / r["a"] + 1 / r["b"] + 1 / r["c"] + 1 / r["d"])
        assert abs(r["ci_lo"] - math.exp(math.log(orr) - 1.96 * se)) < 1e-4
        assert abs(r["ci_hi"] - math.exp(math.log(orr) + 1.96 * se)) < 1e-4
        assert r["ci_lo"] <= r["odds_ratio"] <= r["ci_hi"]
