"""Wave-279: cohort triangle vs a dict replay (plus the week-0 identity
retention == 1), Feistel vs a hashlib replay INCLUDING the inverse
network (decrypt proves the permutation property constructively)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
WEEK_US = 604800000000


def test_cohort_revenue_triangle_replay(spark):
    rows = {
        (r.cohort, r.age_weeks): r
        for r in QUERIES["warehouse_cohort_revenue_triangle"](spark, SF).collect()
    }
    ev = table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS t", "event_type", "value"
    ).collect()
    first_w = {}
    for r in ev:
        w = r.t // WEEK_US
        if r.user_id not in first_w or w < first_w[r.user_id]:
            first_w[r.user_id] = w
    mc = min(first_w.values())
    cells = defaultdict(lambda: [set(), 0.0])
    for r in ev:
        if r.event_type != "purchase":
            continue
        cw = first_w[r.user_id]
        age = r.t // WEEK_US - cw
        cells[(cw - mc, age)][0].add(r.user_id)
        cells[(cw - mc, age)][1] += r.value
    base = {c: v[1] for (c, a), v in cells.items() if a == 0}
    expect = {
        k: v for k, v in cells.items() if k[0] in base
    }
    assert set(rows) == set(expect)
    for k, (users, revv) in expect.items():
        r = rows[k]
        assert r.n_users == len(users), k
        assert abs(r.revenue - round(revv, 2)) < 0.02
        assert abs(r.revenue_retention - round(revv / base[k[0]], 6)) < 1e-5
    # week-0 identity
    for (c, a), r in rows.items():
        if a == 0:
            assert abs(r.revenue_retention - 1.0) < 1e-9


def _feistel(uid: int) -> int:
    l, r = uid // 1024, uid % 1024
    for rnd in range(1, 5):
        f = int(hashlib.md5(f"f{rnd}:{r}".encode()).hexdigest()[:8], 16)
        l, r = r, (l + f) % 1024
    return l * 1024 + r


def _feistel_inv(p: int) -> int:
    l, r = p // 1024, p % 1024
    for rnd in range(4, 0, -1):
        f = int(hashlib.md5(f"f{rnd}:{l}".encode()).hexdigest()[:8], 16)
        l, r = (r - f) % 1024, l
    return l * 1024 + r


def test_feistel_pseudonym_replay(spark):
    row = QUERIES["privacy_feistel_pseudonym"](spark, SF).collect()[0]
    uids = {
        r.user_id
        for r in table(spark, SF, "events").select("user_id").collect()
    }
    mapped = {u: _feistel(u) for u in uids}
    assert row.n_ids == len(uids)
    assert row.n_pseudonyms == len(set(mapped.values()))
    assert bool(row.bijective)  # a Feistel network IS a permutation
    assert row.min_pseudo == min(mapped.values())
    assert row.max_pseudo == max(mapped.values())
    assert row.n_fixed_points == sum(1 for u, p in mapped.items() if u == p)
    # constructive proof: the inverse network recovers every id
    for u, p in mapped.items():
        assert _feistel_inv(p) == u
