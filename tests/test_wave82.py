"""Wave-82 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_knn_classify_matches_numpy(spark):
    rows = QUERIES["model_knn_classify"](spark, SF_SMALL).collect()
    pdf = table(spark, SF_SMALL, "embeddings").toPandas()
    X = np.stack(pdf["embedding"].map(np.asarray))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    qmask = ids < 50
    sims = X[qmask] @ X[~qmask].T
    tids, tlabels = ids[~qmask], labels[~qmask]
    assert len(rows) == qmask.sum()
    for r, sim in zip(rows, sims[np.argsort(ids[qmask])]):
        order = sorted(range(len(sim)), key=lambda j: (-round(sim[j], 6), tids[j]))
        top = [tlabels[j] for j in order[:5]]
        counts = {}
        for lab in top:
            counts[lab] = counts.get(lab, 0) + 1
        pred = min(counts, key=lambda k: (-counts[k], k))
        assert r.pred_label == pred
        assert r.correct == (pred == r.true_label)


def test_max_gain_window_is_optimal(spark):
    r = QUERIES["events_max_gain_window"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = [row.x for row in daily]
    days = [row.day.isoformat() for row in daily]
    mean = sum(xs) / len(xs)
    dev = [x - mean for x in xs]
    # brute-force best contiguous window
    best, bi, bj = -float("inf"), 0, 0
    for i in range(len(dev)):
        s = 0.0
        for j in range(i, len(dev)):
            s += dev[j]
            if s > best + 1e-9:
                best, bi, bj = s, i, j
    assert r.start_day == days[bi]
    assert r.end_day == days[bj]
    assert abs(r.gain_above_mean - best) < 1e-3


def test_erosion_bounds(spark):
    rows = QUERIES["mm_image_erosion"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 3) % 16
        img = np.fromfunction(
            lambda y, x: (x * 7 + y * 13 + r.doc_id) % 256, (h, w), dtype=np.int64
        )
        # brute-force erosion on a few docs
        if r.doc_id < 10:
            er = np.array(
                [
                    [img[y - 1 : y + 2, x - 1 : x + 2].min() for x in range(1, w - 1)]
                    for y in range(1, h - 1)
                ]
            )
            assert r.eroded_sum == er.sum()
            assert r.eroded_min == er.min()
            assert r.eroded_max == er.max()
        assert 0 <= r.eroded_min <= r.eroded_max <= 255
