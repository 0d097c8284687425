"""Wave-270: Hill numbers vs a Counter replay (plus the Hill-number
monotonicity q0 >= q1 >= q2 >= qinf), guesswork vs a sorted-class
replay (plus the Massey bound E[G] >= 2^H_inf/2-ish sanity via
pmax * guesswork >= ~1/2... we assert the simple bounds instead)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_hill_numbers_replay(spark):
    row = QUERIES["agg_hill_numbers"](spark, SF).collect()[0]
    cnt = Counter(
        r.user_id for r in table(spark, SF, "events").select("user_id").collect()
    )
    t = sum(cnt.values())
    ps = [c / t for c in cnt.values()]
    q0 = len(ps)
    q1 = math.exp(-sum(p * math.log(p) for p in ps))
    q2 = 1 / sum(p * p for p in ps)
    qi = 1 / max(ps)
    assert row.richness_q0 == q0
    assert abs(row.shannon_q1 - round(q1, 6)) < 1e-5
    assert abs(row.simpson_q2 - round(q2, 6)) < 1e-5
    assert abs(row.berger_parker_qinf - round(qi, 6)) < 1e-5
    assert abs(row.evenness_q2 - round(q2 / q0, 6)) < 1e-6
    # Hill numbers are non-increasing in q
    assert q0 + 1e-9 >= row.shannon_q1 >= row.simpson_q2 >= row.berger_parker_qinf - 1e-9
    assert row.berger_parker_qinf >= 1


def test_guesswork_replay(spark):
    row = QUERIES["privacy_guesswork"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "event_id", "event_type", "hour(ts) AS h", "ts"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append(r)
    classes = Counter()
    for u, evs in per.items():
        first = min(evs, key=lambda r: (r.ts, r.event_id))
        hb = first.h // 6
        cnts = Counter(r.event_type for r in evs)
        dom = min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        classes[(hb, dom)] += 1
    t = sum(classes.values())
    ordered = sorted(classes.items(), key=lambda kv: (-kv[1], kv[0]))
    gw = sum(i * c / t for i, (_k, c) in enumerate(ordered, start=1))
    pmax = ordered[0][1] / t
    singles = sum(1 for _k, c in ordered if c == 1)
    assert row.n_users == t
    assert row.n_classes == len(classes)
    assert abs(row.expected_guesses - round(gw, 6)) < 1e-6
    assert abs(row.min_entropy_bits - round(-math.log(pmax) / math.log(2), 6)) < 1e-6
    assert row.n_singleton_classes == singles
    assert abs(row.unicity - round(singles / t, 6)) < 1e-9
    # best-first guessing needs at least 1 guess, at most (k+1)/2 on average
    assert 1 <= row.expected_guesses <= (row.n_classes + 1) / 2 + 1e-9
