"""Wave-333: win ratio vs a brute-force O(nA*nB) pair walk at
sf0.001; CPM vs a python longest-path DP on the same DAG."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_win_ratio_vs_brute_force(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS g",
        "CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err",
        "CAST(ROUND(value*100) AS LONG) AS v",
    ).collect()
    a = [(r["err"], r["v"]) for r in rows if r["g"]]
    b = [(r["err"], r["v"]) for r in rows if not r["g"]]
    wins = losses = ties = 0
    for ea, va in a:
        for eb, vb in b:
            if ea < eb:
                wins += 1
            elif ea > eb:
                losses += 1
            elif va > vb:
                wins += 1
            elif va < vb:
                losses += 1
            else:
                ties += 1
    row = QUERIES["agg_win_ratio"](spark, SF).first()
    assert row["wins"] == wins
    assert row["losses"] == losses
    assert row["ties"] == ties
    assert abs(row["win_ratio"] - wins / losses) < 1e-6
    assert abs(row["log_win_ratio"] - math.log(wins / losses)) < 1e-6
    assert wins + losses + ties == len(a) * len(b)


def test_cpm_forward_backward_replay(spark):
    sup = (
        table(spark, SF, "supplier")
        .groupBy("s_nationkey")
        .count()
        .collect()
    )
    cnt = {r["s_nationkey"]: r["count"] for r in sup}
    dur = {t: 1 + cnt.get(t, 0) for t in range(25)}
    preds = {
        t: {5 * (t // 5 - 1) + (t * 7 + 1) % 5, 5 * (t // 5 - 1) + (t * 3 + 2) % 5}
        for t in range(5, 25)
    }
    ef = {}
    for t in range(25):
        es = max((ef[p] for p in preds.get(t, ())), default=0)
        ef[t] = es + dur[t]
    span = max(ef[t] for t in range(20, 25))
    succs = {}
    for t, ps in preds.items():
        for p in ps:
            succs.setdefault(p, set()).add(t)
    lf = {}
    for t in range(24, -1, -1):
        if t >= 20:
            lf[t] = span
        else:
            lf[t] = min(lf[s] - dur[s] for s in succs[t])
    got = {r["task"]: r for r in QUERIES["opt_critical_path"](spark, SF).collect()}
    assert len(got) == 25
    crit_found = False
    for t in range(25):
        r = got[t]
        assert r["duration"] == dur[t]
        assert r["early_finish"] == ef[t]
        assert r["early_start"] == ef[t] - dur[t]
        assert r["late_finish"] == lf[t]
        assert r["slack"] == lf[t] - ef[t]
        assert r["critical"] == (lf[t] == ef[t])
        assert r["pert_te_sixths"] == 6 * dur[t] + 14
        crit_found = crit_found or r["critical"]
    assert crit_found  # a critical path always exists
    # the critical chain reaches the project span
    assert max(got[t]["early_finish"] for t in range(25)) == span
