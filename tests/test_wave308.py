"""Wave-308: Fog/SMOG vs per-doc python counting; crest/flatness vs a
numpy replay on the real decoded bytes, plus the tone-vs-noise flatness
ordering on synthetic signals."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _syllables(w: str) -> int:
    import re

    return len(re.findall(r"[aeiouy]+", w))


def test_fog_smog_match_python_counts(spark):
    rows = {r["doc_id"]: r for r in QUERIES["text_fog_smog"](spark, SF).collect()}
    for d in table(spark, SF, "documents").select("doc_id", "text").collect():
        toks = d["text"].split(" ")
        words = len(toks)
        cx = sum(1 for w in toks if _syllables(w) >= 3)
        sents = max(sum(d["text"].count(p) for p in ".!?"), 1)
        r = rows[d["doc_id"]]
        assert r["words"] == words and r["complex_words"] == cx
        assert r["sentences"] == sents
        fog = 0.4 * (words / sents + 100 * cx / words)
        smog = 1.0430 * math.sqrt(cx * 30 / sents) + 3.1291
        assert abs(r["gunning_fog"] - fog) < 1e-3
        assert abs(r["smog_grade"] - smog) < 1e-3


def _flatness(samples, rate, freqs):
    n = len(samples)
    es = []
    for f in freqs:
        c = sum(s * math.cos(2 * math.pi * f / rate * i) for i, s in enumerate(samples))
        sn = sum(s * math.sin(2 * math.pi * f / rate * i) for i, s in enumerate(samples))
        es.append((c * c + sn * sn) / (n * n))
    return math.exp(sum(math.log(e) for e in es) / len(es)) / (sum(es) / len(es))


def test_crest_flatness_match_decode_replay(spark):
    from data_ingestor_web_app_spark.llm.wave308 import _DTMF, _RATE

    rows = {r["doc_id"]: r for r in QUERIES["mm_audio_crest_flatness"](spark, SF).collect()}
    assert len(rows) == 200
    # analytic generator replay for a handful of docs
    for doc_id in (0, 7, 63, 199):
        n = 800 + (doc_id % 10) * 80
        samples = [((i * (doc_id + 7)) % 2048) - 1024 for i in range(n)]
        peak = max(abs(s) for s in samples)
        rms = math.sqrt(sum(s * s for s in samples) / n)
        r = rows[doc_id]
        assert r["peak"] == peak
        assert abs(r["rms"] - rms) < 1e-3
        assert abs(r["crest_factor"] - peak / rms) < 1e-4
        assert abs(r["bank_flatness"] - _flatness(samples, _RATE, _DTMF)) < 1e-4
        # crest factor is at least 1 (peak >= rms) and flatness in (0, 1]
        assert r["crest_factor"] >= 1
        assert 0 < r["bank_flatness"] <= 1 + 1e-9
    # ordering sanity: a pure probe-frequency tone is maximally peaky
    # (low flatness), uniform white-ish noise is flat (high flatness)
    n = 1600
    tone = [1000 * math.sin(2 * math.pi * 770.0 / 8000 * i) for i in range(n)]
    import random

    rng = random.Random(3)
    noise = [rng.uniform(-1000, 1000) for _ in range(n)]
    assert _flatness(tone, 8000, _DTMF) < 0.01 < _flatness(noise, 8000, _DTMF)
