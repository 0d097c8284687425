"""Wave-115 semantic checks."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_MED, SF_SMALL


def _half_up(v: float) -> int:
    # Spark ROUND / DuckDB ROUND are half-away-from-zero; Python round() is
    # banker's — replicate the engines' rule (values here are non-negative)
    return int(math.floor(v + 0.5))


def test_bollinger_matches_numpy_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["events_bollinger_bands"](spark, SF_SMALL).collect()
    }
    pdf = (
        table(spark, SF_SMALL, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"), "value")
        .toPandas()
    )
    for etype, g in pdf.groupby("event_type"):
        daily = g.groupby("day")["value"].apply(
            lambda v: _half_up(sum(_half_up(x * 1e6) for x in v) / len(v) / 1000.0)
        )
        closes = daily.sort_index().to_numpy(dtype=np.int64)
        r = rows[etype]
        assert r.n_days == len(closes)
        expect_windows = max(0, len(closes) - 6)
        assert r.n_windows == expect_windows
        above = below = 0
        max_bw = None
        for i in range(6, len(closes)):
            w = closes[i - 6 : i + 1]
            s, q = int(w.sum()), int((w.astype(object) ** 2).sum())
            mean7 = s / 7
            sd7 = math.sqrt((7 * q - s * s) / 42)
            if closes[i] > mean7 + 2 * sd7:
                above += 1
            if closes[i] < mean7 - 2 * sd7:
                below += 1
            if mean7 > 0:
                bw = 4 * sd7 / mean7
                max_bw = bw if max_bw is None else max(max_bw, bw)
        assert r.n_above_upper == above
        assert r.n_below_lower == below
        if max_bw is not None:
            assert abs(r.max_bandwidth - round(max_bw, 6)) < 2e-6


def test_transitivity_profile_consistent_with_triangle_count(spark):
    rows = QUERIES["graph_transitivity_profile"](spark, SF_MED).collect()
    assert rows, "sf0.01 co-occurrence graph must be non-empty"
    total_node_tri = sum(r.closed_wedges for r in rows)
    n_tri = QUERIES["graph_triangle_count"](spark, SF_MED).first().n_triangles
    # each triangle contributes one closed wedge at each of its 3 nodes
    assert total_node_tri == 3 * n_tri
    for r in rows:
        assert 0 <= r.closed_wedges <= r.possible_wedges
        if r.possible_wedges:
            assert abs(
                r.closure_rate - round(r.closed_wedges / r.possible_wedges, 6)
            ) < 2e-6
        assert r.n_nodes >= 1


def test_weibull_lmom_matches_numpy(spark):
    rows = {r.grp: r for r in QUERIES["model_weibull_lmom"](spark, SF_SMALL).collect()}
    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .toPandas()
    )
    for grp, g in pdf.groupby("l_returnflag"):
        x = np.sort(
            np.floor(g["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        )
        n = len(x)
        b0 = x.sum() / n
        b1 = (np.arange(n, dtype=np.float64) * x).sum() / (n * (n - 1))
        l2 = 2 * b1 - b0
        tau = l2 / b0
        k = -math.log(2) / math.log(1 - tau)
        # lower median via the same (price, orderkey, linenumber) total order
        gs = g.sort_values(["l_extendedprice", "l_orderkey", "l_linenumber"])
        med = _half_up(gs["l_extendedprice"].iloc[(n + 1) // 2 - 1] * 100) / 100
        eta = med / math.log(2) ** (1 / k)
        r = rows[grp]
        assert r.n == n
        assert abs(r.weibull_k - k) < 1e-4
        assert abs(r.weibull_scale - eta) < max(1e-2, eta * 1e-5)
        assert r.weibull_k > 0 and r.weibull_scale > 0
        # sanity: fitted CDF at the sample median is one half
        cdf_med = 1 - math.exp(-((med / eta) ** k))
        assert abs(cdf_med - 0.5) < 1e-9
