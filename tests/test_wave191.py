"""Wave-191: Yule's K / Simpson vs brute-force counting; Juilland's D vs
numpy per-source moments; grouped-Lorenz Gini vs the classic sorted-rank
formula on the ungrouped vocabulary."""

from __future__ import annotations

from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _token_counts(spark):
    docs = table(spark, SF, "documents").select("source", "text").collect()
    per_source = {}
    total = Counter()
    for r in docs:
        toks = r["text"].split(" ")
        total.update(toks)
        per_source.setdefault(r["source"], Counter()).update(toks)
    return total, per_source


def test_yule_k_simpson_brute_force(spark):
    row = QUERIES["text_yule_k_simpson"](spark, SF).collect()[0]
    total, _ = _token_counts(spark)
    n = sum(total.values())
    v = len(total)
    sm2 = sum(f * f for f in total.values())
    sff1 = sum(f * (f - 1) for f in total.values())
    assert row["n_tokens"] == n
    assert row["n_vocab"] == v
    assert abs(row["yule_k"] - 1e4 * (sm2 - n) / (n * n)) < 1e-5
    assert abs(row["simpson_d"] - sff1 / (n * (n - 1))) < 1e-5
    # Simpson's D is a probability; Yule's K is 10^4 * that shape
    assert 0.0 <= row["simpson_d"] <= 1.0


def test_juilland_dispersion_numpy(spark):
    rows = QUERIES["text_juilland_dispersion"](spark, SF).collect()
    assert len(rows) == 20
    total, per_source = _token_counts(spark)
    k = len(per_source)
    top = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = {}
    for tok, s in top:
        cells = np.array([per_source[src].get(tok, 0) for src in per_source])
        cv = cells.std() / cells.mean()  # population std, zeros included
        expect[tok] = (s, 1 - cv / np.sqrt(k - 1))
    got = {r["token"]: r for r in rows}
    assert set(got) == set(expect)
    for tok, (s, d) in expect.items():
        assert got[tok]["total"] == s
        assert abs(got[tok]["juilland_d"] - d) < 1e-5
        # uniform-ish synthetic sources: D should land near 1, never < 0
        assert 0.0 <= got[tok]["juilland_d"] <= 1.0


def test_token_gini_sorted_rank_formula(spark):
    row = QUERIES["text_token_gini"](spark, SF).collect()[0]
    total, _ = _token_counts(spark)
    f = np.sort(np.array(list(total.values()), dtype=np.float64))
    v = len(f)
    n = f.sum()
    ranks = np.arange(1, v + 1, dtype=np.float64)
    gini = 2.0 * (ranks * f).sum() / (v * n) - (v + 1) / v
    assert row["n_tokens"] == int(n)
    assert row["n_vocab"] == v
    assert abs(row["gini"] - gini) < 1e-5
    assert 0.0 <= row["gini"] < 1.0
