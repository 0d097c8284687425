"""Wave-224: OLS influence vs numpy hat-matrix diagnostics; VIF /
condition number vs numpy eigendecomposition."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_ols_influence_numpy(spark):
    rows = {r["day_idx"]: r for r in QUERIES["model_ols_influence"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    xs = np.array(sorted(y), dtype=np.float64)
    ys = np.array([y[int(d)] for d in xs], dtype=np.float64)
    n = len(xs)
    A = np.vstack([np.ones_like(xs), xs]).T
    coef, *_ = np.linalg.lstsq(A, ys, rcond=None)
    resid = ys - A @ coef
    H = A @ np.linalg.inv(A.T @ A) @ A.T
    lev = np.diag(H)
    mse = (resid**2).sum() / (n - 2)
    flagged = 0
    for i, d in enumerate(xs):
        r = rows[int(d)]
        assert abs(r["residual"] - resid[i]) < max(1e-2, abs(resid[i]) * 1e-4)
        assert abs(r["leverage"] - lev[i]) < 1e-5
        stud = resid[i] / math.sqrt(mse * (1 - lev[i]))
        assert abs(r["studentized"] - stud) < 1e-3
        cd = resid[i] ** 2 * lev[i] / (2 * mse * (1 - lev[i]) ** 2)
        assert abs(r["cooks_d"] - cd) < max(1e-4, cd * 1e-3)
        assert r["influential"] == (cd > 4.0 / n)
        flagged += r["influential"]
    # hat-matrix trace identity: sum of leverages == p == 2
    assert abs(sum(r["leverage"] for r in rows.values()) - 2.0) < 1e-4
    assert flagged < n  # never all influential


def test_vif_condition_numpy(spark):
    row = QUERIES["model_vif_condition"](spark, SF).collect()[0]
    li = table(spark, SF, "lineitem").select("l_quantity", "l_discount").collect()
    x1 = np.array([math.floor(r["l_quantity"] * 10 + 0.5) for r in li], dtype=np.float64)
    x2 = np.array([math.floor(r["l_discount"] * 100 + 0.5) for r in li], dtype=np.float64)
    r12 = float(np.corrcoef(x1, x2)[0, 1])
    assert row["n_rows"] == len(li)
    assert abs(row["r12"] - r12) < 1e-6
    assert abs(row["vif"] - 1 / (1 - r12 * r12)) < 1e-5
    # eigen check: kappa = sqrt(lmax/lmin) of the 2x2 correlation matrix
    C = np.array([[1, r12], [r12, 1]])
    w = np.linalg.eigvalsh(C)
    kappa = math.sqrt(w[-1] / w[0])
    assert abs(row["condition_number"] - kappa) < 1e-5
    assert row["collinear_flag"] == (1 / (1 - r12 * r12) > 5.0)
