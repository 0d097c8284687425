"""Wave-209: S-H-ESD vs a python replay with median-seasonal removal;
linear SHAP vs numpy lstsq betas and the additivity property."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_shesd_replay(spark):
    rows = sorted(
        QUERIES["events_shesd_anomalies"](spark, SF).collect(),
        key=lambda r: r["iteration"],
    )
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    dow = {}
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
        dow[d] = (r["ts"].date().isoweekday() % 7)  # Sunday=0, like Spark-1
    groups = defaultdict(list)
    for d in y:
        groups[dow[d]].append(y[d])
    m2 = {}
    for w, vals in groups.items():
        vals = sorted(vals)
        k = len(vals)
        med2 = vals[k // 2] * 2 if k % 2 else vals[k // 2 - 1] + vals[k // 2]
        m2[w] = med2
    remaining = {d: 2 * y[d] - m2[dow[d]] for d in y}
    for it, row in enumerate(rows, 1):
        n = len(remaining)
        s = sum(remaining.values())
        s2 = sum(v * v for v in remaining.values())
        day = min(remaining, key=lambda d: (-abs(n * remaining[d] - s), d))
        dev = abs(n * remaining[day] - s)
        sd = math.sqrt((n * s2 - s * s) / (n * n * (n - 1)))
        assert row["iteration"] == it
        assert row["day_idx"] == day
        assert row["units"] == y[day]
        assert abs(row["residual"] - remaining[day] / 2.0) < 1e-9
        assert abs(row["r_stat"] - dev / (n * sd)) < 1e-5
        del remaining[day]


def test_linear_shap_additivity_and_betas(spark):
    rows = QUERIES["model_linear_shap"](spark, SF).collect()
    li = table(spark, SF, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    x1 = np.array([math.floor(r["l_quantity"] * 10 + 0.5) for r in li])
    x2 = np.array([math.floor(r["l_discount"] * 100 + 0.5) for r in li])
    yy = np.array([math.floor(r["l_extendedprice"] * 100 + 0.5) for r in li])
    A = np.vstack([x1, x2, np.ones_like(x1)]).T.astype(np.float64)
    beta, *_ = np.linalg.lstsq(A, yy.astype(np.float64), rcond=None)
    assert len(rows) == len(li)
    # spot-check attributions against numpy betas
    m1, m2_, my = x1.mean(), x2.mean(), yy.mean()
    got_q = np.array([r["shap_quantity"] for r in rows])
    got_d = np.array([r["shap_discount"] for r in rows])
    # distributional match (row order differs): compare sorted samples
    exp_q = np.sort(beta[0] * (x1 - m1) / 100)
    exp_d = np.sort(beta[1] * (x2 - m2_) / 100)
    assert np.abs(np.sort(got_q) - exp_q).max() < max(
        1e-3, np.abs(exp_q).max() * 1e-4
    )
    assert np.abs(np.sort(got_d) - exp_d).max() < max(
        1e-3, np.abs(exp_d).max() * 1e-4
    )
    # base value is the target mean; attributions are centered
    assert abs(rows[0]["base_value"] - my / 100) < 1e-3
    assert abs(got_q.mean()) < 1e-2
    assert abs(got_d.mean()) < 1e-2
