"""Wave-80 semantic checks."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_bm25_ranks_matching_docs(spark):
    rows = QUERIES["text_bm25_topk"](spark, SF_SMALL).collect()
    assert len(rows) == 15
    assert [r.rk for r in rows] == list(range(1, 16))
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > 0
    # brute-force the winner's score in plain python
    docs = {
        r.doc_id: r.text.lower().split()
        for r in table(spark, SF_SMALL, "documents").collect()
    }
    dls = {d: len([t for t in toks if t]) for d, toks in docs.items()}
    n = len(docs)
    avgdl = sum(dls.values()) / n
    k1, b = 1.2, 0.75

    def score(d):
        s = 0.0
        for term in ("window", "merge", "stream"):
            tf = docs[d].count(term)
            df = sum(1 for t in docs.values() if term in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
        return s

    best = max(docs, key=lambda d: (score(d), -d))
    assert rows[0].doc_id == best
    assert abs(rows[0].bm25 - score(best)) < 1e-3


def test_t_closeness_emd_bounds(spark):
    rows = QUERIES["privacy_t_closeness"](spark, SF_SMALL).collect()
    nations = table(spark, SF_SMALL, "nation").count()
    assert len(rows) == nations
    for r in rows:
        assert 0.0 <= r.emd <= 1.0
        # verdict agrees with the displayed EMD up to its 6dp rounding
        assert r.t_violation == (r.emd > 0.2) or abs(r.emd - 0.2) < 1e-6
    # EMD of the union of all classes against itself would be 0; sanity:
    # at least one class differs from the global distribution
    assert any(r.emd > 0 for r in rows)


def test_periodogram_finds_planted_cycle(spark):
    rows = {r.period: r.amplitude for r in QUERIES["events_periodogram"](spark, SF_SMALL).collect()}
    assert set(rows) == {7, 14, 30}
    for amp in rows.values():
        assert amp >= 0
    # cross-check one bin against numpy on the same daily series
    import numpy as np
    import pyspark.sql.functions as F

    daily = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .collect()
    )
    d0 = daily[0].day
    t = np.array([(r.day - d0).days for r in daily])
    x = np.array([r.x for r in daily], dtype=float)
    dev = x - x.mean()
    for p in (7, 14, 30):
        c = np.round(np.cos(2 * np.pi * (t % p) / p) * 1e6)
        s = np.round(np.sin(2 * np.pi * (t % p) / p) * 1e6)
        amp = 2 * math.hypot((dev * c).sum(), (dev * s).sum()) / (1e6 * len(t))
        assert abs(rows[p] - amp) < 1e-2
