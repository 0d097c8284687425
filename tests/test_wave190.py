"""Wave-190: Heaps fit vs numpy polyfit on the same checkpoints; code
detector flag algebra; UTF-8 excess-byte semantics."""

from __future__ import annotations

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_heaps_fit_matches_numpy(spark):
    row = QUERIES["text_heaps_law_fit"](spark, SF).collect()[0]
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    from data_ingestor_web_app_spark.operators.wave190 import _FRACS

    m = max(r["doc_id"] for r in docs)
    cps = sorted({int(np.floor(f * m)) for f in _FRACS if np.floor(f * m) >= 1})
    first = {}
    words_per_doc = {}
    for r in docs:
        toks = r["text"].split(" ")
        words_per_doc[r["doc_id"]] = len(toks)
        for t in toks:
            if t not in first or r["doc_id"] < first[t]:
                first[t] = r["doc_id"]
    xs, ys = [], []
    for c in cps:
        v = sum(1 for fd in first.values() if fd < c)
        w = sum(n for d, n in words_per_doc.items() if d < c)
        if v > 0 and w > 0:
            xs.append(np.log(w))
            ys.append(np.log(v))
    beta, lnk = np.polyfit(np.array(xs), np.array(ys), 1)
    assert row["n_points"] == len(xs)
    assert abs(row["beta"] - beta) < 1e-4
    assert abs(row["k_coef"] - np.exp(lnk)) < 1e-3 * max(1.0, np.exp(lnk))
    # sub-linear growth; the synthetic fixture has a FIXED token pool, so
    # the vocabulary saturates and beta sits near 0 (real text: 0.4-0.8)
    assert 0.0 <= row["beta"] < 1.0


def test_code_detect_flag_consistency(spark):
    rows = QUERIES["text_code_detect"](spark, SF).collect()
    docs = table(spark, SF, "documents").where("LENGTH(text) > 0")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_code_like"] <= r["n_docs"]
        assert 0.0 <= r["symbol_density"] < 0.5


def test_ascii_ratio_excess_byte_semantics(spark):
    rows = {r["lang"]: r for r in QUERIES["text_ascii_ratio_by_lang"](spark, SF).collect()}
    for r in rows.values():
        assert 0.0 <= r["ascii_byte_ratio"] <= 1.0
        assert r["utf8_excess_bytes"] >= 0
    # independent recompute per language (the synthetic fixture is
    # ASCII-only for every lang label, so excess must be exactly 0 —
    # which also proves the byte/char identity holds; a real zh corpus
    # would show excess ≈ 2x chars)
    for lang, row in rows.items():
        docs = (
            table(spark, SF, "documents")
            .where(F"lang = '{lang}'")
            .select("text")
            .collect()
        )
        excess = sum(len(r["text"].encode("utf-8")) - len(r["text"]) for r in docs)
        assert row["utf8_excess_bytes"] == excess
        assert row["n_docs"] == len(docs)
    # multi-byte detection sanity on a constructed frame
    df = spark.createDataFrame([("汉字abc",), ("plain",)], ["text"])
    got = df.selectExpr(
        "octet_length(text) - length(text) AS excess"
    ).collect()
    assert sorted(g["excess"] for g in got) == [0, 4]  # 2 CJK chars x 2 extra bytes
