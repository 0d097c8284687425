"""Wave-227: AIC/BIC ladder vs numpy fits, nesting property, and
BIC-vs-AIC penalty ordering."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_aic_bic_ladder_numpy(spark):
    rows = {r["model"]: r for r in QUERIES["model_aic_bic_ladder"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    xs = np.array(sorted(y), dtype=np.float64)
    ys = np.array([y[int(d)] for d in xs], dtype=np.float64)
    n = len(xs)

    def sse_lin(x, v):
        A = np.vstack([x, np.ones_like(x)]).T
        c, *_ = np.linalg.lstsq(A, v, rcond=None)
        return float(((v - A @ c) ** 2).sum())

    sses = {
        "constant": float(((ys - ys.mean()) ** 2).sum()),
        "linear": sse_lin(xs, ys),
        "broken_stick": sse_lin(xs[xs < 15], ys[xs < 15])
        + sse_lin(xs[xs >= 15], ys[xs >= 15]),
    }
    ks = {"constant": 1, "linear": 2, "broken_stick": 4}
    bics = {
        m: n * math.log(s / n) + ks[m] * math.log(n) for m, s in sses.items()
    }
    best = min(bics, key=bics.get)
    assert set(rows) == set(sses)
    for m, r in rows.items():
        assert r["k_params"] == ks[m]
        assert abs(r["sse"] - sses[m]) < max(1.0, sses[m] * 1e-6)
        aic = n * math.log(sses[m] / n) + 2 * ks[m]
        assert abs(r["aic"] - aic) < 1e-3
        assert abs(r["bic"] - bics[m]) < 1e-3
        assert r["is_best"] == (m == best)
        assert abs(
            r["log10_bf_vs_best"]
            - round(round(bics[m] - bics[best], 6) / (2 * math.log(10)), 4)
        ) < 1e-3
    # nesting: more parameters never raises SSE
    assert rows["linear"]["sse"] <= rows["constant"]["sse"] + 1e-6
    assert rows["broken_stick"]["sse"] <= rows["linear"]["sse"] + 1e-6
    # exactly one winner, delta_bic of the winner is 0
    assert sum(r["is_best"] for r in rows.values()) == 1
    assert rows[best]["delta_bic"] == 0.0
