"""Wave-260: DM vs a numpy autocovariance replay, randomization test vs
a hashlib sign replay, plus the cross-op coherence check that both tests
see the SAME loss differentials."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _diffs(spark):
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    ys = [sum(v) / len(v) for _, v in sorted(per.items())]
    out = []
    for i in range(7, len(ys)):
        e1 = ys[i - 1] - ys[i]
        e2 = ys[i - 7] - ys[i]
        out.append(e1 * e1 - e2 * e2)
    return out


def test_diebold_mariano_replay(spark):
    row = QUERIES["model_diebold_mariano"](spark, SF).collect()[0]
    d = _diffs(spark)
    t = len(d)
    dbar = sum(d) / t
    e = [x - dbar for x in d]
    gam = [sum(e[i] * e[i - k] for i in range(k, t)) / t for k in range(4)]
    lrv = gam[0] + 2 * sum((1 - k / 4) * gam[k] for k in range(1, 4))
    dm = dbar / math.sqrt(lrv / t)
    assert row.t_obs == t
    assert abs(row.mean_loss_diff - round(dbar, 6)) < 1e-5
    assert abs(row.lrv - round(lrv, 6)) < 1e-4
    assert abs(row.dm_stat - round(dm, 6)) < 1e-4
    assert bool(row.accuracy_differs) == (abs(dm) > 1.959964)


def test_randomization_paired_replay(spark):
    row = QUERIES["model_randomization_paired"](spark, SF).collect()[0]
    d = _diffs(spark)
    t = len(d)
    dbar = sum(d) / t
    n_extreme = 0
    for f in range(64):
        fm = 0.0
        for rn, x in enumerate(d, start=1):
            h = int(hashlib.md5(f"rt:{f}:{rn}".encode()).hexdigest()[:8], 16)
            fm += x if h % 2 == 0 else -x
        fm /= t
        if abs(fm) >= abs(dbar):
            n_extreme += 1
    assert row.t_obs == t
    assert abs(row.mean_loss_diff - round(dbar, 6)) < 1e-5
    assert row.n_flips == 64
    assert row.n_extreme == n_extreme
    assert abs(row.p_value - round((1 + n_extreme) / 65, 6)) < 1e-9
    assert 1 / 65 <= row.p_value <= 1.0


def test_both_tests_share_differentials(spark):
    dm = QUERIES["model_diebold_mariano"](spark, SF).collect()[0]
    rt = QUERIES["model_randomization_paired"](spark, SF).collect()[0]
    assert dm.t_obs == rt.t_obs
    assert abs(dm.mean_loss_diff - rt.mean_loss_diff) < 1e-9
