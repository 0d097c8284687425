"""Wave-123 semantics: winnowing guarantees, substring-span structure,
DSIR targetness."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_winnowing_density_and_bounds(spark):
    rows = QUERIES["text_winnowing_fingerprint"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_fingerprints"] <= r["n_windows"]
        assert 0 < r["fp_density"] <= 1.0
    # expected density 2/(w+1) = 1/3 for w=5; corpus-wide mean should be in
    # a loose band around it (dup-heavy docs repeat grams, lowering it)
    mean_d = sum(r["fp_density"] for r in rows) / len(rows)
    assert 0.15 < mean_d < 0.55


def test_winnowing_shared_substring_shares_fingerprint(spark):
    # two docs sharing a >= w+k-1 = 8-token run must share a fingerprint
    # hash; build the selected-hash sets per doc via the dedup spans twin:
    # any dedup_substring_span doc pair sharing an 8-gram qualifies.
    spans = QUERIES["dedup_substring_span"](spark, SF).collect()
    docs_with_span = {r["doc_id"] for r in spans}
    if not docs_with_span:
        return
    fp = QUERIES["text_winnowing_fingerprint"](spark, SF)
    # fingerprint selection picks at least one gram inside every >=8-token
    # window, so a doc with a duplicated span must have >= 1 fingerprint
    got = {r["doc_id"] for r in fp.collect()}
    assert docs_with_span <= got


def test_substring_spans_merge_and_bound(spark):
    rows = QUERIES["dedup_substring_span"](spark, SF).collect()
    lens = {
        r["doc_id"]: r["n"]
        for r in table(spark, SF, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    per_doc = defaultdict(list)
    for r in rows:
        assert r["span_end"] - r["span_start"] + 1 == r["n_tokens"]
        assert r["n_tokens"] >= 8  # a span covers at least one 8-shingle
        assert 1 <= r["span_start"] <= r["span_end"] <= lens[r["doc_id"]]
        per_doc[r["doc_id"]].append((r["span_start"], r["span_end"]))
    # islands are maximal: spans of one doc neither overlap nor touch
    for spans in per_doc.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1


def test_dsir_weights_prefer_target_language(spark):
    rows = QUERIES["pipeline_dsir_weights"](spark, SF).collect()
    langs = {
        r["doc_id"]: r["lang"]
        for r in table(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    # per-feature average weight, so length does not confound the check
    en = [r["dsir_logw_micro"] / r["n_features"] for r in rows if langs[r["doc_id"]] == "en"]
    other = [r["dsir_logw_micro"] / r["n_features"] for r in rows if langs[r["doc_id"]] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)
