"""Wave-346: PDM vs a python fold-and-pool replay."""

from __future__ import annotations

from datetime import date

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
PERIODS = {3: 3, 5: 5, 7: 7, 10: 5}


def test_phase_dispersion_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    base = date(2024, 1, 1)
    series = {
        (d - base).days: s / 100.0 / n for d, (n, s) in agg.items()
    }
    n = len(series)
    mu = sum(series.values()) / n
    s2_total = sum((v - mu) ** 2 for v in series.values()) / (n - 1)
    got = {
        r["period"]: r
        for r in QUERIES["events_phase_dispersion"](spark, SF).collect()
    }
    thetas = {}
    for period, nbins in PERIODS.items():
        bins = {}
        for i, v in series.items():
            b = (i % period) * nbins // period
            bins.setdefault(b, []).append(v)
        ssb = sum(
            sum(x * x for x in vs) - sum(vs) ** 2 / len(vs)
            for vs in bins.values()
        )
        s2_pooled = ssb / (n - len(bins))
        theta = s2_pooled / s2_total
        thetas[period] = theta
        row = got[period]
        assert row["n_days"] == n
        assert row["n_bins"] == len(bins)
        assert abs(row["pooled_var"] - s2_pooled) < 1e-6
        assert abs(row["total_var"] - s2_total) < 1e-6
        assert abs(row["theta"] - theta) < 1e-6
    best = min(thetas, key=lambda p: thetas[p])
    for p, r in got.items():
        assert r["best_period"] == (p == best)
    # thetas hover near 1 for this near-noise fixture
    assert all(0 < t < 2 for t in thetas.values())
