"""Wave-137: CCF vs python, Granger vs numpy OLS."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _series(spark):
    rows = sorted(
        (r["day"], r["x"], r["y"])
        for r in (
            table(spark, SF, "events")
            .groupBy(F.col("ts").cast("date").alias("day"))
            .agg(
                F.count("*").alias("x"),
                F.sum(F.round(F.col("value") * 1000).cast("long")).alias("y"),
            )
            .collect()
        )
    )
    return [x for _, x, _ in rows], [y for _, _, y in rows]


def test_ccf_matches_python(spark):
    xs, ys = _series(spark)
    got = {r["lag_days"]: r for r in QUERIES["events_cross_correlation_lagged"](spark, SF).collect()}
    assert set(got) == set(range(8))
    for k in range(8):
        px = xs[k:]
        py = ys[: len(ys) - k] if k else ys
        n = len(px)
        sx, sy = sum(px), sum(py)
        qx = sum(v * v for v in px)
        qy = sum(v * v for v in py)
        sxy = sum(a * b for a, b in zip(px, py))
        ccf = (n * sxy - sx * sy) / math.sqrt(n * qx - sx * sx) / math.sqrt(n * qy - sy * sy)
        assert got[k]["n"] == n
        assert abs(got[k]["ccf"] - ccf) < 1e-5
        assert -1.0 <= got[k]["ccf"] <= 1.0


def test_granger_matches_numpy_ols(spark):
    import numpy as np

    xs, ys = _series(spark)
    r = QUERIES["events_granger_f"](spark, SF).collect()[0]
    x = np.array(xs[1:], dtype=float)
    xl = np.array(xs[:-1], dtype=float)
    yl = np.array(ys[:-1], dtype=float)
    n = len(x)
    assert r["n_obs"] == n

    def rss(design):
        a = np.column_stack([np.ones(n)] + design)
        beta, *_ = np.linalg.lstsq(a, x, rcond=None)
        e = x - a @ beta
        return float(e @ e)

    rss_r = rss([xl])
    rss_u = rss([xl, yl])
    assert abs(r["rss_restricted"] - rss_r) < max(1e-2, rss_r * 1e-6)
    assert abs(r["rss_unrestricted"] - rss_u) < max(1e-2, rss_u * 1e-6)
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    assert abs(r["f_stat"] - f) < 1e-3
    assert r["f_stat"] >= -1e-9
