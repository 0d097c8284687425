"""Wave-83 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL

_STOP = {"the", "a", "is", "of", "to", "and", "in"}


def test_rake_phrases_are_stopword_free_runs(spark):
    rows = QUERIES["text_rake_keywords"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert [r.rk for r in rows] == list(range(1, 21))
    scores = [r.rake_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    texts = [r.text.lower() for r in table(spark, SF_SMALL, "documents").collect()]
    for r in rows:
        words = r.phrase.split(" ")
        assert len(words) >= 2
        assert not (set(words) & _STOP)
        # phrase occurs contiguously in at least one document
        assert any(f" {r.phrase} " in f" {t} " or t.startswith(r.phrase + " ")
                   or t.endswith(" " + r.phrase) or t == r.phrase for t in texts)


def test_isotonic_fit_is_monotone_and_matches_pav(spark):
    rows = QUERIES["model_isotonic_calibration"](spark, SF_SMALL).collect()
    iso = [r.iso_rate for r in rows]
    assert iso == sorted(iso)
    # weighted mean is preserved by isotonic regression
    n = np.array([r.n for r in rows], dtype=float)
    raw = np.array([r.raw_rate for r in rows])
    assert abs((n * iso).sum() - (n * raw).sum()) < 1e-2
    # sequential PAV on the same buckets
    blocks = [[r.raw_rate * r.n, float(r.n), 1] for r in rows]
    out = []
    for b in blocks:
        out.append(list(b))
        while len(out) > 1 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1] - 1e-15:
            s, w, c = out.pop()
            out[-1][0] += s
            out[-1][1] += w
            out[-1][2] += c
    expanded = []
    for s, w, c in out:
        expanded.extend([s / w] * c)
    assert np.allclose(iso, expanded, atol=1e-5)


def test_hodges_lehmann_matches_numpy(spark):
    rows = QUERIES["agg_hodges_lehmann"](spark, SF_SMALL).collect()
    pdf = (
        table(spark, SF_SMALL, "events")
        .where(F.col("event_id") < 2000)
        .select("event_type", "value")
        .toPandas()
    )
    for r in rows:
        vals = pdf[pdf.event_type == r.event_type]["value"].to_numpy()
        pm = (vals[:, None] + vals[None, :]) / 2
        iu = np.triu_indices(len(vals), k=1)
        means = np.sort(pm[iu])
        assert r.n_pairs == len(means)
        lower_median = means[(len(means) + 1) // 2 - 1]
        assert abs(r.hl_estimate - lower_median) < 1e-3
