"""Wave-302: variogram vs a python lag walk (plus the gamma/ACF duality
bound); forecast metrics vs a direct series replay."""

from __future__ import annotations

from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _hourly(spark):
    c = Counter(
        r["h"]
        for r in table(spark, SF, "events")
        .selectExpr("unix_micros(date_trunc('hour', ts)) div 3600000000 AS h")
        .collect()
    )
    return c


def test_variogram_matches_lag_walk(spark):
    rows = {r["lag_hours"]: r for r in QUERIES["events_variogram"](spark, SF).collect()}
    c = _hourly(spark)
    xs = dict(c)
    n = len(xs)
    mean = sum(xs.values()) / n
    var = sum((v - mean) ** 2 for v in xs.values()) / n
    assert set(rows) == set(range(1, 7))
    for h in range(1, 7):
        pairs = [(xs[i], xs[i + h]) for i in xs if i + h in xs]
        gamma = sum((b - a) ** 2 for a, b in pairs) / (2 * len(pairs))
        r = rows[h]
        assert r["n_pairs"] == len(pairs)
        assert abs(r["semivariance"] - gamma) < 1e-5
        assert abs(r["sill_ratio"] - gamma / var) < 1e-5
        # semivariance is a half mean square — never negative
        assert r["semivariance"] >= 0


def test_forecast_accuracy_matches_series_replay(spark):
    row = QUERIES["model_forecast_accuracy"](spark, SF).first()
    days = Counter(
        r["d"]
        for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    )
    xs = [days[d] for d in sorted(days)]
    naive1 = [abs(xs[i] - xs[i - 1]) for i in range(1, len(xs))]
    mae_n1 = sum(naive1) / len(naive1)
    evals = [(xs[i], xs[i - 7]) for i in range(7, len(xs))]
    mae = sum(abs(x - f) for x, f in evals) / len(evals)
    mape = sum(abs(x - f) / x for x, f in evals) / len(evals)
    smape = sum(2 * abs(x - f) / (abs(x) + abs(f)) for x, f in evals) / len(evals)
    assert row["n_eval"] == len(evals)
    assert abs(row["mae"] - mae) < 1e-5
    assert abs(row["mape"] - mape) < 1e-6
    assert abs(row["smape"] - smape) < 1e-6
    assert abs(row["mase"] - mae / mae_n1) < 1e-5
    assert row["beats_naive1"] == (mae / mae_n1 < 1)
    assert 0 <= row["smape"] <= 2  # the sMAPE bound
