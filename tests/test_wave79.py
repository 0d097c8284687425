"""Wave-79 semantic checks."""

from __future__ import annotations

import numpy as np

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_cusum_matches_recurrence(spark):
    rows = QUERIES["events_cusum_drift"](spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r.day)
    xs = [r.n_events for r in rows]
    n, total = len(xs), sum(xs)
    mean = total / n
    # replay the textbook nonlinear recurrence (k = 0) and compare
    s_up = s_dn = 0.0
    for r, x in zip(rows, xs):
        s_up = max(0.0, s_up + (x - mean))
        s_dn = max(0.0, s_dn + (mean - x))
        assert abs(r.cusum_up - s_up) < 1e-3
        assert abs(r.cusum_dn - s_dn) < 1e-3
        assert r.alarm_up == (s_up > mean / 2 + 1e-9)
        assert r.alarm_dn == (s_dn > mean / 2 + 1e-9)


def test_logistic_newton_step_matches_numpy(spark):
    r = QUERIES["model_logistic_newton_step"](spark, SF_SMALL).first()
    from data_ingestor_web_app_spark.io import table

    pdf = (
        table(spark, SF_SMALL, "lineitem")
        .select("l_discount", "l_returnflag")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), np.round(pdf["l_discount"] * 100).astype(np.int64)]
    )
    y = (pdf["l_returnflag"] == "R").astype(float).to_numpy()
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    assert abs(r.beta0 - beta[0]) < 1e-5
    assert abs(r.beta1 - 100 * beta[1]) < 1e-5
    # the step moves the intercept toward the log-odds of the base rate
    assert (r.beta0 > 0) == (r.mean_y > 0.5)


def test_image_integral_corner_identity(spark):
    rows = QUERIES["mm_image_integral"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 3) % 16
        img = np.fromfunction(
            lambda y, x: (x * 7 + y * 13 + r.doc_id) % 256, (h, w), dtype=np.int64
        )
        assert r.total_sum == img.sum()
        cx, cy = w // 2, h // 2
        assert r.center_integral == img[: cy + 1, : cx + 1].sum()
        assert r.br_box_sum == img[cy + 1 :, cx + 1 :].sum()
