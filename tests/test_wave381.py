"""Wave-381 independent replays: ARCH LM via numpy lstsq on the lagged
design matrix (the independent-solve invariant for closed-form fits);
Goldfeld-Quandt via numpy polyfit residuals per third."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .orderBy("day")
        .collect()
    )
    return [int(r["c"]) for r in rows]


def test_arch_lm_numpy_lstsq_replay(spark):
    cs = _daily(spark)
    nd, s = len(cs), sum(cs)
    # Spark div / DuckDB // truncate toward zero; python // floors, so
    # mirror truncation explicitly with sign-magnitude:
    r = np.array(
        [
            (abs(1000 * (c * nd - s)) // nd) * (1 if (c * nd - s) >= 0 else -1)
            for c in cs
        ],
        dtype=np.int64,
    )
    y = (r * r).astype(np.float64)
    x1, x2 = y[1:-1], y[:-2]
    yy = y[2:]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, yy, rcond=None)
    fitted = X @ beta
    ss_res = ((yy - fitted) ** 2).sum()
    ss_tot = ((yy - yy.mean()) ** 2).sum()
    r2 = 1 - ss_res / ss_tot
    n = len(yy)
    row = QUERIES["agg_arch_lm_test"](spark, SF).collect()[0]
    assert row["n_obs"] == n
    assert abs(row["r2"] - r2) < 1e-6
    assert abs(row["lm_stat"] - n * r2) < 1e-3
    assert row["arch_effect_5pct"] == (n * r2 > 5.991464547107979)


def test_goldfeld_quandt_polyfit_replay(spark):
    cs = _daily(spark)
    n = len(cs)
    third = n // 3
    t = np.arange(1, n + 1, dtype=np.float64)
    y = np.array(cs, dtype=np.float64)
    early = slice(0, third)
    late = slice(n - third, n)

    def rss(sl):
        coef = np.polyfit(t[sl], y[sl], 1)
        resid = y[sl] - np.polyval(coef, t[sl])
        return float((resid**2).sum()), len(y[sl])

    ra, na = rss(early)
    rb, nb = rss(late)
    va, vb = ra / (na - 2), rb / (nb - 2)
    row = QUERIES["agg_goldfeld_quandt"](spark, SF).collect()[0]
    assert (row["n_early"], row["n_late"]) == (na, nb)
    assert abs(row["var_early"] - va) < 1e-2
    assert abs(row["var_late"] - vb) < 1e-2
    assert abs(row["gq_f"] - vb / va) < 1e-5
    assert row["variance_increasing"] == (vb / va > 1.0)
