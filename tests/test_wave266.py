"""Wave-266: CKA vs a numpy GRAM-MATRIX replay (the engine uses the
d x d moment identity; the replay builds the centered n x n linear Gram
and computes textbook HSIC — independent algebra proving the identity),
SMR vs a stratified counting replay."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cka_linear_replay(spark):
    row = QUERIES["sim_cka_linear"](spark, SF).collect()[0]
    E = np.array(
        [r.embedding for r in table(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    X, Y = E[:, :32], E[:, 32:]
    Xc = X - X.mean(axis=0)
    Yc = Y - Y.mean(axis=0)
    # textbook linear HSIC via feature-space cross-covariance norms
    fxy = float(np.linalg.norm(Xc.T @ Yc, "fro") ** 2)
    fxx = float(np.linalg.norm(Xc.T @ Xc, "fro") ** 2)
    fyy = float(np.linalg.norm(Yc.T @ Yc, "fro") ** 2)
    cka = fxy / math.sqrt(fxx * fyy)
    assert abs(row.hsic_xy - fxy) < 1e-4 * max(1, fxy)
    assert abs(row.hsic_xx - fxx) < 1e-4 * max(1, fxx)
    assert abs(row.hsic_yy - fyy) < 1e-4 * max(1, fyy)
    assert abs(row.cka - round(cka, 6)) < 1e-5
    # CKA is a normalized alignment: in [0, 1]
    assert 0 <= row.cka <= 1 + 1e-9
    # and equals 1 for a view against itself (identity sanity, replay-side)
    self_cka = fxx / math.sqrt(fxx * fxx)
    assert abs(self_cka - 1) < 1e-12


def test_smr_byar_replay(spark):
    row = QUERIES["agg_smr_byar"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "hour(ts) AS h",
        "CAST(dayofweek(ts) IN (1,7) AS INT) AS we",
        "CAST(event_type = 'error' AS INT) AS bad",
    ).collect()
    wd = defaultdict(lambda: [0, 0])
    wk = defaultdict(lambda: [0, 0])
    for r in ev:
        tgt = wk if r.we else wd
        tgt[r.h][0] += 1
        tgt[r.h][1] += r.bad
    o = sum(v[1] for v in wk.values())
    e = sum(
        (wd[h][1] / wd[h][0]) * wk[h][0] for h in wk if h in wd and wd[h][0]
    )
    smr = o / e
    z = 1.959964
    lo = (o / e) * (1 - 1 / (9 * o) - z / (3 * math.sqrt(o))) ** 3
    hi = ((o + 1) / e) * (1 - 1 / (9 * (o + 1)) + z / (3 * math.sqrt(o + 1))) ** 3
    assert row.observed == o
    assert abs(row.expected - round(e, 6)) < 1e-5
    assert abs(row.smr - round(smr, 6)) < 1e-6
    assert abs(row.smr_ci_lo - round(lo, 6)) < 1e-5
    assert abs(row.smr_ci_hi - round(hi, 6)) < 1e-5
    assert row.smr_ci_lo < row.smr < row.smr_ci_hi
    assert bool(row.excess_significant) == (lo > 1.0 or hi < 1.0)
