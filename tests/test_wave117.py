"""Wave-117 semantic checks."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_hurst_rs_matches_numpy_bruteforce(spark):
    r = QUERIES["events_hurst_rs"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .toPandas()
    )
    x = daily["x"].to_numpy(dtype=np.int64)
    meds = {}
    for m in (4, 16):
        rs_vals = []
        for b in range(len(x) // m):
            w = x[b * m : (b + 1) * m]
            s, q = int(w.sum()), int((w * w).sum())
            if m * q - s * s <= 0:
                continue
            cum = np.cumsum(w)
            d = m * cum - np.arange(1, m + 1) * s
            rs_vals.append((int(d.max()) - int(d.min())) / math.sqrt(m * q - s * s))
        rs_vals.sort()
        meds[m] = (len(rs_vals), rs_vals[(len(rs_vals) + 1) // 2 - 1])
    assert r.n_boxes_4 == meds[4][0]
    assert r.n_boxes_16 == meds[16][0]
    assert abs(r.rs_med_4 - round(meds[4][1], 6)) < 2e-6
    assert abs(r.rs_med_16 - round(meds[16][1], 6)) < 2e-6
    expect_h = math.log(meds[16][1] / meds[4][1]) / math.log(4)
    assert abs(r.hurst_h - round(expect_h, 6)) < 2e-6
    # R/S grows with box size for any non-degenerate series
    assert r.rs_med_16 > r.rs_med_4


def test_hits_matches_numpy_power_iteration(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["graph_hits_bipartite"](spark, SF_SMALL).collect()
    }
    pdf = (
        table(spark, SF_SMALL, "events")
        .groupBy("user_id", "event_type")
        .count()
        .toPandas()
    )
    users = sorted(pdf["user_id"].unique())
    types = sorted(pdf["event_type"].unique())
    W = np.zeros((len(users), len(types)), dtype=object)
    for _, row in pdf.iterrows():
        W[users.index(row["user_id"]), types.index(row["event_type"])] = int(
            row["count"]
        )
    a1 = W.sum(axis=0)
    h = W @ a1
    a2 = W.T @ h
    for t, name in enumerate(types):
        r = rows[name]
        assert r.authority_1 == int(a1[t])
        assert r.authority_2 == float(a2[t])
    # normalization: exactly one event type at 1.0, ranks are 1..n
    assert sum(1 for r in rows.values() if r.authority_norm == 1.0) == 1
    assert sorted(r.auth_rank for r in rows.values()) == list(
        range(1, len(types) + 1)
    )


def test_hapax_profile_matches_python_counts(spark):
    rows = {
        r.source: r for r in QUERIES["text_hapax_profile"](spark, SF_SMALL).collect()
    }
    pdf = table(spark, SF_SMALL, "documents").select("source", "text").toPandas()
    from collections import Counter

    for src, g in pdf.groupby("source"):
        c = Counter()
        n_tokens = 0
        for t in g["text"]:
            toks = t.split(" ")
            n_tokens += len(toks)
            c.update(toks)
        r = rows[src]
        assert r.n_tokens == n_tokens
        assert r.vocab == len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        dis = sum(1 for v in c.values() if v == 2)
        assert r.hapax == hapax
        assert r.dis_legomena == dis
        assert abs(r.type_token_ratio - round(len(c) / n_tokens, 6)) < 2e-6
        assert 0 <= r.hapax_share <= 1 and 0 <= r.sichel_s <= 1
