"""Wave-87 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_glcm_features_match_numpy(spark):
    rows = QUERIES["mm_image_glcm"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows[:15]:
        w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 3) % 16
        img = np.fromfunction(
            lambda y, x: (x * 7 + y * 13 + r.doc_id) % 256, (h, w), dtype=np.int64
        )
        lv = img // 32
        la, lb = lv[:, :-1].ravel(), lv[:, 1:].ravel()
        total = len(la)
        contrast = ((la - lb) ** 2).sum() / total
        from collections import Counter

        c = Counter(zip(la.tolist(), lb.tolist()))
        energy = sum(v * v for v in c.values()) / total / total
        homog = sum(v / (1 + abs(a - b)) for (a, b), v in c.items()) / total
        assert abs(r.contrast - contrast) < 1e-6
        assert abs(r.energy - energy) < 1e-6
        assert abs(r.homogeneity - homog) < 1e-6
        assert 0 < r.energy <= 1 and 0 < r.homogeneity <= 1


def test_markov_stationary_is_distribution(spark):
    r = QUERIES["events_markov_stationary"](spark, SF_SMALL).first()
    pis = [r.pi_click, r.pi_error, r.pi_purchase, r.pi_signup, r.pi_view]
    assert all(p >= 0 for p in pis)
    assert abs(sum(pis) - 1.0) < 1e-4
    # power iteration from uniform over a near-uniform chain stays interior
    assert all(0.05 < p < 0.5 for p in pis)
    # cross-check against numpy power iteration on the same matrix
    pdf = (
        table(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    states = ["click", "error", "purchase", "signup", "view"]
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((5, 5))
    for _, g in pdf.groupby("user_id"):
        seq = g["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            P[idx[a], idx[b]] += 1
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(5, 0.2)
    for _ in range(3):
        pi = pi @ P
    assert np.allclose(pis, pi, atol=1e-4)


def test_group_by_all_equals_explicit(spark):
    rows = QUERIES["sql_group_by_all"](spark, SF_SMALL).collect()
    explicit = (
        table(spark, SF_SMALL, "orders")
        .join(table(spark, SF_SMALL, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(table(spark, SF_SMALL, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"),
        )
        .orderBy("n_name", "o_orderstatus", "n_orders", "cents")
        .collect()
    )
    assert rows == explicit
