"""Wave-244: linear counting vs a hashlib bitmap replay (including the
estimator's analytic accuracy bound at this load factor), exponential
mechanism vs a hashlib Gumbel-max replay plus the softmax-sampling
sanity that high-utility candidates get high scores."""

from __future__ import annotations

import hashlib
import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
M = 1024


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_linear_counting_replay(spark):
    row = QUERIES["agg_linear_counting"](spark, SF).collect()[0]
    users = {
        r.user_id
        for r in table(spark, SF, "events").select("user_id").collect()
    }
    buckets = {_md5_u32(f"lc:{u}") % M for u in users}
    occupied = len(buckets)
    est = M * math.log(M) if occupied >= M else -M * math.log((M - occupied) / M)
    assert row.m == M
    assert row.n_exact == len(users)
    assert row.occupied == occupied
    assert abs(row.estimate - round(est, 4)) < 1e-3
    assert abs(row.rel_err_pct - round(100 * (est - len(users)) / len(users), 4)) < 1e-3
    # at load factor n/m << 1 the LC estimate is within a few percent
    if len(users) < M / 2:
        assert abs(row.rel_err_pct) < 15.0


def test_exponential_mechanism_replay(spark):
    rows = {r.event_type: r for r in QUERIES["privacy_exponential_mechanism"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("event_type").collect()
    utils = {}
    for r in ev:
        utils[r.event_type] = utils.get(r.event_type, 0) + 1
    scores = {}
    for et, u in utils.items():
        unif = (_md5_u32(f"em:{et}") + 0.5) / 4294967296.0
        g = -math.log(-math.log(unif))
        scores[et] = (u, g, 0.1 * u / 2.0 + g)
    winner = max(scores, key=lambda et: scores[et][2])
    assert set(rows) == set(utils)
    n_sel = 0
    for et, r in rows.items():
        u, g, s = scores[et]
        assert r.utility == u
        assert abs(r.gumbel - round(g, 6)) < 1e-9
        assert abs(r.score - round(s, 6)) < 1e-9
        n_sel += 1 if r.selected else 0
        if r.selected:
            assert et == winner
    assert n_sel == 1
    # Gumbel noise is standard: all draws land in a plausible range
    for _, g, _ in scores.values():
        assert -3 < g < 10
