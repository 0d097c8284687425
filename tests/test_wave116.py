"""Wave-116 semantic checks."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _half_up(v: float) -> int:
    return int(math.floor(v + 0.5))


def _daily(spark, cols):
    return (
        table(spark, SF_SMALL, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"), "value")
        .toPandas()
    )


def test_rsi_cutler_matches_bruteforce(spark):
    rows = {
        r.event_type: r for r in QUERIES["events_rsi_cutler"](spark, SF_SMALL).collect()
    }
    pdf = _daily(spark, None)
    for etype, g in pdf.groupby("event_type"):
        closes = (
            g.groupby("day")["value"]
            .apply(lambda v: sum(_half_up(x * 1000) for x in v))
            .sort_index()
            .to_numpy(dtype=np.int64)
        )
        d = np.diff(closes)
        rsis = []
        for i in range(13, len(d)):
            w = d[i - 13 : i + 1]
            gsum = int(w[w > 0].sum())
            lsum = int(-w[w < 0].sum())
            if gsum + lsum:
                rsis.append(100.0 * gsum / (gsum + lsum))
        r = rows[etype]
        assert r.n_windows == len(rsis)
        assert r.n_overbought == sum(1 for x in rsis if x > 70)
        assert r.n_oversold == sum(1 for x in rsis if x < 30)
        assert abs(r.min_rsi - round(min(rsis), 4)) < 1e-3
        assert abs(r.max_rsi - round(max(rsis), 4)) < 1e-3
        assert 0 <= r.min_rsi <= r.max_rsi <= 100


def test_kendall_tau_matches_scipy_free_bruteforce(spark):
    r = QUERIES["agg_kendall_tau"](spark, SF_SMALL).first()
    pdf = _daily(spark, None)
    daily = pdf.groupby("day").agg(
        x=("value", "size"),
        y=("value", lambda v: sum(_half_up(t * 1000) for t in v)),
    )
    x = daily["x"].to_numpy(dtype=np.int64)
    y = daily["y"].to_numpy(dtype=np.int64)
    n = len(x)
    conc = disc = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (x[i] - x[j]) * (y[i] - y[j])
            if p > 0:
                conc += 1
            elif p < 0:
                disc += 1
            elif x[i] == x[j] and y[i] != y[j]:
                tx += 1
            elif y[i] == y[j] and x[i] != x[j]:
                ty += 1
    n0 = n * (n - 1) // 2
    assert r.n_pairs == n0
    assert (r.concordant, r.discordant) == (conc, disc)
    assert (r.ties_x_only, r.ties_y_only) == (tx, ty)
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(r.tau_b - round(tau, 6)) < 2e-6
    assert -1 <= r.tau_b <= 1


def test_periodic_snapshot_cumulative_is_consistent(spark):
    rows = QUERIES["warehouse_periodic_snapshot"](spark, SF_SMALL).collect()
    by_seg = {}
    for r in sorted(rows, key=lambda r: (r.segment, r.month)):
        by_seg.setdefault(r.segment, []).append(r)
    o = table(spark, SF_SMALL, "orders")
    total_orders = o.count()
    assert sum(r.orders_in_month for r in rows) == total_orders
    for seg, seq in by_seg.items():
        cum_o, cum_rev = 0, 0.0
        for r in seq:
            cum_o += r.orders_in_month
            cum_rev = round(cum_rev + r.month_revenue, 2)
            assert r.cum_orders == cum_o, (seg, r.month)
            assert abs(r.cum_revenue - cum_rev) < 0.02, (seg, r.month)
        # final cumulative row equals the segment total
        assert seq[-1].cum_orders == sum(r.orders_in_month for r in seq)
