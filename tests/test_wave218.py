"""Wave-218: AIPW vs a python replay (plus the double-robustness
identity on stratified models); Quade vs a from-scratch recompute."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _midranks2(values):
    return [
        2 * sum(1 for w in values if w < v)
        + sum(1 for w in values if w == v)
        + 1
        for v in values
    ]


def test_aipw_replay(spark):
    row = QUERIES["events_doubly_robust_ate"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "value").collect()
    base = []
    for r in ev:
        dow = (r["ts"].date().isoweekday() % 7) + 1
        t = 1 if r["ts"].hour >= 12 else 0
        y = int(math.floor(r["value"] * 100 + 0.5))
        base.append((dow, t, y))
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n, nt, syt, syc
    for dow, t, y in base:
        c = cells[dow]
        c[0] += 1
        c[1] += t
        c[2] += t * y
        c[3] += (1 - t) * y
    sdr = 0
    for dow, t, y in base:
        n, nt, syt, syc = cells[dow]
        m1, m0 = syt / nt, syc / (n - nt)
        e1, e0 = nt / n, (n - nt) / n
        dr = (t * (y - m1) / e1 + m1) - ((1 - t) * (y - m0) / e0 + m0)
        sdr += math.floor(1e3 * dr)
    nn = len(base)
    st = sum(t for _, t, _ in base)
    syt = sum(t * y for _, t, y in base)
    syc = sum((1 - t) * y for _, t, y in base)
    naive = syt / st - syc / (nn - st)
    assert row["n_events"] == nn
    assert abs(row["ate_naive"] - naive / 100) < 1e-6
    assert abs(row["ate_aipw"] - sdr / (1e3 * nn * 100)) < 1e-6
    # with stratified cell models, AIPW reduces to the stratified
    # regression-adjusted ATE: sum_g (n_g/N)(m1_g - m0_g)
    strat = sum(
        (c[0] / nn) * (c[2] / c[1] - c[3] / (c[0] - c[1]))
        for c in cells.values()
    )
    assert abs(row["ate_aipw"] - strat / 100) < 1e-3


def test_quade_replay(spark):
    row = QUERIES["agg_quade_test"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts").collect()
    cells = Counter()
    days = set()
    for r in ev:
        d = r["ts"].date()
        days.add(d)
        cells[(d, r["ts"].hour // 6)] += 1
    k = 4
    day_list = sorted(days)
    n = len(day_list)
    rngs = []
    r2s = {}
    for d in day_list:
        vals = [cells.get((d, b), 0) for b in range(k)]
        r2s[d] = _midranks2(vals)
        rngs.append(max(vals) - min(vals))
    q2s = _midranks2(rngs)
    q2 = dict(zip(day_list, q2s))
    s4 = [0] * k
    a16 = 0
    for d in day_list:
        for b in range(k):
            cent = r2s[d][b] - (k + 1)
            s4[b] += q2[d] * cent
            a16 += q2[d] * q2[d] * cent * cent
    b16 = sum(x * x for x in s4)
    bstat = b16 / n
    f = (n - 1) * bstat / (a16 - bstat)
    assert row["n_blocks"] == n
    assert row["k_treatments"] == k
    assert abs(row["b_stat"] - bstat / 16.0) < 1e-4
    assert abs(row["a_stat"] - a16 / 16.0) < 1e-4
    assert abs(row["quade_f"] - f) < 1e-4
    assert row["quade_f"] >= 0
