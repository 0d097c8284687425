"""Wave-378 independent replays: ANCOVA via numpy lstsq on the full dummy
design matrix (group indicators + covariate — NOT the moment algebra the
builders share with the oracle); g-chart by a per-user event walk."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_ancova_numpy_design_matrix_replay(spark):
    import numpy as np

    rows = (
        table(spark, SF, "events")
        .select(
            "event_type",
            F.hour("ts").alias("x"),
            F.round(F.col("value") * 1000).cast("long").alias("y"),
        )
        .collect()
    )
    groups = sorted({r["event_type"] for r in rows})
    gi = {g: i for i, g in enumerate(groups)}
    n, k = len(rows), len(groups)
    X = np.zeros((n, k + 1))
    y = np.zeros(n)
    for i, r in enumerate(rows):
        X[i, gi[r["event_type"]]] = 1.0
        X[i, k] = r["x"]
        y[i] = r["y"]
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    slope = beta[k]
    xbar_all = sum(r["x"] for r in rows) / n
    got = {r["event_type"]: r for r in QUERIES["model_ancova_adjustment"](spark, SF).collect()}
    assert set(got) == set(groups)
    for g in groups:
        # the separate-means parametrization: intercept_g = adjusted mean
        # at x = 0; adjusted mean at x̄ = intercept_g + slope * x̄
        adj = (beta[gi[g]] + slope * xbar_all) / 1000
        row = got[g]
        assert abs(row["pooled_slope"] - slope) < 1e-5
        assert abs(row["adjusted_mean"] - adj) < 1e-5
        gx = [r["x"] for r in rows if r["event_type"] == g]
        gy = [r["y"] for r in rows if r["event_type"] == g]
        assert row["n"] == len(gx)
        assert row["raw_mean"] == round(sum(gy) / len(gy) / 1000, 6)


def test_g_chart_event_walk(spark):
    rows = (
        table(spark, SF, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    gaps = []
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        since = 0
        for r in evs:
            if r["event_type"] == "error":
                gaps.append(since)
                since = 0
            else:
                since += 1
    n = len(gaps)
    gbar = sum(gaps) / n
    ucl = gbar + 3 * math.sqrt(gbar * (gbar + 1))
    lcl = max(0.0, gbar - 3 * math.sqrt(gbar * (gbar + 1)))
    row = QUERIES["events_g_chart"](spark, SF).collect()[0]
    assert row["n_gaps"] == n
    assert row["mean_gap"] == round(gbar, 4)
    assert row["ucl"] == round(ucl, 4)
    assert row["lcl"] == round(lcl, 4)
    assert row["n_above_ucl"] == sum(1 for g in gaps if g > ucl)
    assert row["max_gap"] == max(gaps)
