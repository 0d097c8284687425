"""Wave-318: coupon collection vs a per-user walk; birthday collisions vs
an md5 replay and the occupancy identities."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_coupon_collector_matches_user_walk(spark):
    row = QUERIES["events_coupon_collector"](spark, SF).first()
    per_user = defaultdict(list)
    types = set()
    for r in table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
        types.add(r["event_type"])
    k = len(types)
    dones = []
    for evs in per_user.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        seen = set()
        done = None
        for i, (_, _, et) in enumerate(evs, 1):
            seen.add(et)
            if len(seen) == k:
                done = i
                break
        if done:
            dones.append(done)
    hk = sum(1 / i for i in range(1, k + 1))
    assert row["n_types"] == k
    assert row["n_users"] == len(per_user)
    assert row["n_complete"] == len(dones)
    assert abs(row["mean_events_to_complete"] - sum(dones) / len(dones)) < 1e-4
    assert abs(row["coupon_expectation"] - k * hk) < 1e-4
    assert abs(
        row["ratio_vs_uniform"] - (sum(dones) / len(dones)) / (k * hk)
    ) < 1e-4
    # collection can never finish before k draws
    assert min(dones) >= k


def test_birthday_collisions_match_md5_replay(spark):
    row = QUERIES["agg_birthday_collisions"](spark, SF).first()
    hv = Counter(
        int(hashlib.md5(str(r["o_orderkey"]).encode()).hexdigest()[:6], 16)
        for r in table(spark, SF, "orders").select("o_orderkey").collect()
    )
    n = sum(hv.values())
    pairs = sum(c * (c - 1) // 2 for c in hv.values())
    assert row["n_keys"] == n
    assert row["n_distinct"] == len(hv)
    assert row["n_collided"] == n - len(hv)
    assert row["coll_pairs"] == pairs
    exp = n * (n - 1) / 2 / 2**24
    assert abs(row["expected_pairs"] - exp) < 1e-4
    assert abs(row["p_any_collision"] - (1 - math.exp(-exp))) < 1e-6
    assert abs(row["pairs_vs_expected"] - pairs / exp) < 1e-3
    # occupancy identity: collided keys <= colliding pairs
    assert row["n_collided"] <= row["coll_pairs"]
