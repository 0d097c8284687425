"""Wave-289: TR statistic vs a moments replay (plus the reversal
antisymmetry: TR of the reversed series is exactly -TR), binomial EM
vs a python E/M replay (plus the DLR monotonicity theorem)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _tr(xs):
    m = sum(xs) / len(xs)
    z = [x - m for x in xs]
    pairs = list(zip(z[1:], z[:-1]))
    n = len(pairs)
    m21 = sum(a * a * b for a, b in pairs) / n
    m12 = sum(a * b * b for a, b in pairs) / n
    v = sum(a * a for a, _ in pairs) / n
    return n, m21, m12, (m21 - m12) / (v * math.sqrt(v))


def test_time_irreversibility_replay(spark):
    row = QUERIES["events_time_irreversibility"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "value"
    ).collect()
    acc = defaultdict(list)
    for r in ev:
        acc[r.h].append(r.value)
    xs = [sum(v) / len(v) for _, v in sorted(acc.items())]
    n, m21, m12, tr = _tr(xs)
    assert row.n_pairs == n
    assert abs(row.e_x2_xlag - round(m21, 6)) < 1e-5
    assert abs(row.e_x_xlag2 - round(m12, 6)) < 1e-5
    assert abs(row.tr_statistic - round(tr, 6)) < 1e-5
    assert abs(row.tr_scaled - round(math.sqrt(n) * tr, 6)) < 1e-4
    # time-reversal antisymmetry (replay-side): TR(reversed) = -TR,
    # up to the one-pair boundary (the lag window drops opposite ends)
    _, m21r, m12r, trr = _tr(list(reversed(xs)))
    assert abs(trr + tr) < 0.05 * max(1.0, abs(tr))


def test_em_binomial_step_replay(spark):
    row = QUERIES["model_em_binomial_step"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "CAST(event_type = 'purchase' AS INT) AS p"
    ).collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        per[r.user_id][0] += 1
        per[r.user_id][1] += r.p
    p1, p2, w = 0.1, 0.3, 0.5

    def lik(p, n, k):
        return math.exp(k * math.log(p) + (n - k) * math.log(1 - p))

    ll_old = 0.0
    g1s = []
    for n, k in per.values():
        l1 = w * lik(p1, n, k)
        l2 = (1 - w) * lik(p2, n, k)
        g1s.append((l1 / (l1 + l2), n, k))
        ll_old += math.log(l1 + l2)
    w_new = sum(g for g, _, _ in g1s) / len(g1s)
    p1_new = sum(g * k for g, _, k in g1s) / sum(g * n for g, n, _ in g1s)
    p2_new = sum((1 - g) * k for g, _, k in g1s) / sum(
        (1 - g) * n for g, n, _ in g1s
    )
    ll_new = sum(
        math.log(
            w_new * lik(p1_new, n, k) + (1 - w_new) * lik(p2_new, n, k)
        )
        for _, n, k in g1s
    )
    assert row.n_users == len(per)
    assert abs(row.weight_comp1 - round(w_new, 6)) < 1e-6
    assert abs(row.p1_updated - round(p1_new, 6)) < 1e-6
    assert abs(row.p2_updated - round(p2_new, 6)) < 1e-6
    assert abs(row.loglik_before - round(ll_old, 6)) < 1e-4
    assert abs(row.loglik_after - round(ll_new, 6)) < 1e-4
    # Dempster-Laird-Rubin: one EM step never decreases the likelihood
    assert bool(row.em_monotone) and ll_new >= ll_old - 1e-9
    # components stay ordered and inside (0, 1)
    assert 0 < row.p1_updated < row.p2_updated < 1
