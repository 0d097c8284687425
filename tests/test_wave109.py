"""Wave-109 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_markov_removal_effects(spark):
    rows = QUERIES["events_attribution_markov_removal"](spark, SF_SMALL).collect()
    assert len(rows) == 4
    base = rows[0].conv_prob_base
    for r in rows:
        assert r.conv_prob_base == base
        assert 0 <= r.conv_prob_removed <= 1
        # removing a channel cannot CREATE conversion paths
        assert r.conv_prob_removed <= r.conv_prob_base + 1e-9
        assert r.removal_effect >= -1e-9
    # numpy replay of the base absorption walk
    pdf = (
        table(spark, SF_SMALL, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ch = ["click", "error", "signup", "view"]
    idx = {c: i for i, c in enumerate(ch)}
    P = np.zeros((4, 4))
    pc = np.zeros(4)
    denom = np.zeros(4)
    for _, g in pdf.groupby("user_id"):
        seq = g["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            if a in idx:
                denom[idx[a]] += 1
                if b in idx:
                    P[idx[a], idx[b]] += 1
                elif b == "purchase":
                    pc[idx[a]] += 1
    P = P / denom[:, None]
    pc = pc / denom
    v = np.full(4, 0.25)
    a = 0.0
    for _ in range(8):
        a += v @ pc
        v = v @ P
    assert abs(base - a) < 1e-4


def test_partial_correlation_identity(spark):
    r = QUERIES["agg_partial_correlation"](spark, SF_SMALL).first()
    expect = (r.r_qty_disc - r.r_qty_price * r.r_disc_price) / (
        (1 - r.r_qty_price ** 2) * (1 - r.r_disc_price ** 2)
    ) ** 0.5
    assert abs(r.partial_r_qty_disc_given_price - expect) < 1e-4
    # synthetic fixture: price is independent of quantity, so all three
    # raw correlations are near zero and the partial tracks r_qty_disc
    assert abs(r.r_qty_price) < 0.2
    assert abs(r.partial_r_qty_disc_given_price - r.r_qty_disc) < 0.05
    assert -1 <= r.partial_r_qty_disc_given_price <= 1


def test_journey_perplexity_bounds(spark):
    r = QUERIES["events_journey_perplexity"](spark, SF_SMALL).first()
    # perplexity of a 5-state chain lies in [1, 5]
    assert 1.0 <= r.perplexity <= 5.0
    assert abs(r.perplexity - np.exp(r.cross_entropy_nats)) < 1e-3
    # near-uniform fixture transitions -> perplexity close to 5
    assert r.perplexity > 3.0
