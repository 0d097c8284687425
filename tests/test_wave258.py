"""Wave-258: WW runs vs a sorted-sweep replay, Hoeffding's D vs a
brute-force dominance replay plus the independence-scale sanity
(-0.5 <= D <= 1)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_ww_runs_replay(spark):
    row = QUERIES["events_ww_runs_two_sample"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('view','click')")
        .selectExpr(
            "value", "event_id", "CAST(event_type = 'view' AS INT) AS lbl"
        )
        .collect()
    )
    seq = [r.lbl for r in sorted(ev, key=lambda r: (r.value, r.lbl, r.event_id))]
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    n1, n2 = sum(seq), len(seq) - sum(seq)
    nn = n1 + n2
    e_r = 1 + 2 * n1 * n2 / nn
    var = 2 * n1 * n2 * (2 * n1 * n2 - nn) / (nn * nn * (nn - 1))
    z = (runs - e_r) / math.sqrt(var)
    assert row.n_runs == runs
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.e_runs - round(e_r, 6)) < 1e-9
    assert abs(row.z - round(z, 6)) < 1e-6
    assert bool(row.distributions_differ) == (z < -1.644854)
    assert 1 <= row.n_runs <= nn


def test_hoeffding_d_replay(spark):
    row = QUERIES["agg_hoeffding_d"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "value"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    pts = [(sum(v) / len(v), float(len(v))) for _, v in sorted(per.items())]
    n = len(pts)

    def midrank(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            for k in range(i, j):
                out[order[k]] = (i + 1 + j) / 2
            i = j
        return out

    rs = midrank([p[0] for p in pts])
    ss = midrank([p[1] for p in pts])
    d1 = d2 = d3 = 0.0
    for i, (xi, yi) in enumerate(pts):
        qi = 1.0
        for j, (xj, yj) in enumerate(pts):
            if i == j:
                continue
            if xj < xi and yj < yi:
                qi += 1.0
            elif xj == xi and yj == yi:
                qi += 0.25
            elif (xj == xi and yj < yi) or (xj < xi and yj == yi):
                qi += 0.5
        d1 += qi * (qi - 1)
        d2 += (rs[i] - 1) * (rs[i] - 2) * (ss[i] - 1) * (ss[i] - 2)
        d3 += (rs[i] - 2) * (ss[i] - 2) * qi
    d = (
        30.0
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert row.n_days == n
    assert abs(row.hoeffding_d - round(d, 6)) < 1e-5
    # Hoeffding's D lives in [-0.5, 1]
    assert -0.5 - 1e-9 <= row.hoeffding_d <= 1 + 1e-9
