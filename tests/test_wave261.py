"""Wave-261: Theta vs a SEQUENTIAL SES replay (the engine telescopes
SES to explicit weights; the replay runs the recursion), KZ vs a
triple-convolution replay plus the variance-reduction property."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
ALPHA = 0.3


def _daily(spark):
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    return [sum(v) / len(v) for _, v in sorted(per.items())]


def test_theta_forecast_replay(spark):
    row = QUERIES["events_theta_forecast"](spark, SF).collect()[0]
    y = _daily(spark)
    n = len(y)
    ts = list(range(1, n + 1))
    tbar, ybar = sum(ts) / n, sum(y) / n
    b = sum((t - tbar) * (v - ybar) for t, v in zip(ts, y)) / sum(
        (t - tbar) ** 2 for t in ts
    )
    a = ybar - b * tbar
    z = [2 * v - (a + b * t) for t, v in zip(ts, y)]
    # sequential SES recursion — independent of the engine's telescoped form
    s = z[0]
    for v in z[1:]:
        s = ALPHA * v + (1 - ALPHA) * s
    f0 = a + b * (n + 1)
    assert row.n_days == n
    assert abs(row.trend_slope - round(b, 6)) < 1e-5
    assert abs(row.trend_intercept - round(a, 6)) < 1e-4
    assert abs(row.ses_level_theta2 - round(s, 6)) < 1e-4
    assert abs(row.f_theta0 - round(f0, 6)) < 1e-4
    assert abs(row.f_theta - round((f0 + s) / 2, 6)) < 1e-4
    assert abs(row.f_naive - round(y[-1], 6)) < 1e-6
    # the theta forecast is the average of its two components
    assert abs(row.f_theta - (row.f_theta0 + row.ses_level_theta2) / 2) < 1e-5


def test_kz_filter_replay(spark):
    rows = {r.day: r for r in QUERIES["events_kz_filter"](spark, SF).collect()}
    y = _daily(spark)
    n = len(y)

    def ma5(series):
        return [
            sum(series[max(0, i - 2) : min(n, i + 3)])
            / len(series[max(0, i - 2) : min(n, i + 3)])
            for i in range(n)
        ]

    s = ma5(ma5(ma5(y)))
    days = sorted(rows)
    assert len(days) == n
    for i, d in enumerate(days):
        assert abs(rows[d].raw - round(y[i], 6)) < 1e-6, d
        assert abs(rows[d].kz - round(s[i], 6)) < 1e-5, d
    # smoothing reduces variance
    import statistics

    assert statistics.pvariance(s) < statistics.pvariance(y)
