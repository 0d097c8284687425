"""Wave-103 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_icc_matches_anova_components(spark):
    r = QUERIES["agg_icc_anova"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "orders")
        .join(table(spark, SF_SMALL, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("g"), F.round(F.col("o_totalprice") * 100).cast("long").alias("y"))
        .toPandas()
    )
    groups = [g["y"].to_numpy(dtype=float) for _, g in pdf.groupby("g")]
    n, k = len(pdf), len(groups)
    grand = pdf["y"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    msb, msw = ssb / (k - 1), ssw / (n - k)
    n0 = (n - sum(len(g) ** 2 for g in groups) / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert r.n == n and r.k == k
    assert abs(r.ms_between_e10 - msb / 1e10) < 1e-3
    assert abs(r.ms_within_e10 - msw / 1e10) < 1e-3
    assert abs(r.icc1 - icc) < 1e-4
    assert -1 <= r.icc1 <= 1


def test_max_drawdown_matches_bruteforce(spark):
    r = QUERIES["events_max_drawdown"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
        .orderBy("day")
        .collect()
    )
    p = np.cumsum([row.v for row in daily])
    days = [row.day.isoformat() for row in daily]
    peak = np.maximum.accumulate(p)
    dd = peak - p
    ti = int(np.argmax(dd))
    pi = int(np.argmax(p[: ti + 1] == peak[ti]))
    assert r.trough_day == days[ti]
    assert r.peak_day == days[pi]
    assert abs(r.max_drawdown - dd[ti] / 100) < 0.02
    assert 0 <= r.drawdown_frac <= 1


def test_ucb1_optimism_and_order(spark):
    rows = QUERIES["pipeline_source_ucb1"](spark, SF_SMALL).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.ucb1 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 <= r.mean_reward <= 1
        assert r.bonus > 0
        assert abs(r.ucb1 - (r.mean_reward + r.bonus)) < 2e-6
        # bonus shrinks with pulls: the most-pulled arm has the smallest bonus
    most = max(rows, key=lambda r: r.n_pulls)
    assert most.bonus == min(r.bonus for r in rows)
