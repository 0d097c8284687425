"""Wave-202: dimension stats vs numpy moments on the quantized matrix;
forecast eval suite vs a dict replay."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dimension_stats_numpy(spark):
    rows = {r["dim"]: r for r in QUERIES["sim_dimension_stats"](spark, SF).collect()}
    emb = table(spark, SF, "embeddings").collect()
    Q = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e5
    )
    n, dims = Q.shape
    assert set(rows) == set(range(dims))
    for d in range(dims):
        q = Q[:, d]
        mean = q.mean()
        m2 = ((q - mean) ** 2).mean()
        m3 = ((q - mean) ** 3).mean()
        m4 = ((q - mean) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        r = rows[d]
        assert abs(r["mean"] - mean / 1e5) < 1e-5
        assert abs(r["std"] - math.sqrt(m2) / 1e5) < 1e-5
        assert abs(r["skewness"] - g1) < 1e-4
        assert abs(r["kurtosis_excess"] - g2) < 1e-4
        assert r["min_val"] == q.min() / 1e5
        assert r["max_val"] == q.max() / 1e5
    # gaussian-ish synthetic embeddings: no degenerate dimension
    assert all(r["std"] > 0 for r in rows.values())


def test_forecast_eval_replay(spark):
    row = QUERIES["events_forecast_eval_suite"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    evald = [d for d in range(7, 23) if d in y and (d - 7) in y]
    sae = sum(abs(y[d] - y[d - 7]) for d in evald)
    say = sum(abs(y[d]) for d in evald)
    smape = (
        sum(
            math.floor(2e9 * abs(y[d] - y[d - 7]) / (abs(y[d]) + abs(y[d - 7])))
            for d in evald
        )
        / (1e9 * len(evald))
    )
    naived = [d for d in range(7, 23) if d in y and (d - 1) in y]
    sad1 = sum(abs(y[d] - y[d - 1]) for d in naived)
    mase = (sae / len(evald)) / (sad1 / len(naived))
    assert row["n_days_eval"] == len(evald)
    assert abs(row["wape"] - sae / say) < 1e-6
    assert abs(row["smape"] - smape) < 1e-6
    assert abs(row["mase"] - mase) < 1e-5
    assert 0 <= row["smape"] <= 2
