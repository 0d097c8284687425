"""Wave-267: Oaxaca-Blinder vs numpy per-group OLS plus the exact
accounting identity (the three parts sum to the raw gap)."""

from __future__ import annotations

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_oaxaca_blinder_replay(spark):
    row = QUERIES["model_oaxaca_blinder"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('purchase','view')")
        .selectExpr(
            "CAST(event_type = 'purchase' AS INT) AS g",
            "CAST(unix_micros(ts) % 86400000000 AS DOUBLE)"
            " / 3600000000.0 AS x",
            "value AS y",
        )
        .collect()
    )
    stats = {}
    for g in (0, 1):
        x = np.array([r.x for r in ev if r.g == g])
        y = np.array([r.y for r in ev if r.g == g])
        b, a = np.polyfit(x, y, 1)
        stats[g] = (len(x), float(x.mean()), float(y.mean()), float(b), float(a))
    n0, mx0, my0, b0, a0 = stats[0]
    n1, mx1, my1, b1, a1 = stats[1]
    endow = b0 * (mx1 - mx0)
    coefs = mx0 * (b1 - b0) + (a1 - a0)
    inter = (mx1 - mx0) * (b1 - b0)
    assert row.n1 == n1 and row.n0 == n0
    assert abs(row.total_gap - round(my1 - my0, 6)) < 1e-5
    assert abs(row.endowments - round(endow, 6)) < 1e-4
    assert abs(row.coefficients - round(coefs, 6)) < 1e-4
    assert abs(row.interaction - round(inter, 6)) < 1e-4
    # the accounting identity: parts sum EXACTLY to the gap
    assert abs(row.decomposition_sum - row.total_gap) < 2e-6
    assert abs((endow + coefs + inter) - (my1 - my0)) < 1e-9
