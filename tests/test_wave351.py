"""Wave-351: Che-LRU vs a python Newton replay; quorum availability vs
binomial closed forms."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
CACHE, STEPS, T0 = 20.0, 10, 100.0


def test_che_lru_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "event_type", "user_id", "unix_micros(ts) AS us"
    ).collect()
    cnt = {}
    lo = hi = None
    for r in rows:
        cnt[(r["event_type"], r["user_id"])] = (
            cnt.get((r["event_type"], r["user_id"]), 0) + 1
        )
        lo = r["us"] if lo is None else min(lo, r["us"])
        hi = r["us"] if hi is None else max(hi, r["us"])
    horizon = (hi - lo) / 1e6
    lams = [c / horizon for c in cnt.values()]
    t = T0
    for _ in range(STEPS):
        g = sum(1 - math.exp(-l * t) for l in lams)
        gp = sum(l * math.exp(-l * t) for l in lams)
        t = t - (g - CACHE) / gp
    occ = sum(1 - math.exp(-l * t) for l in lams)
    hit = sum(l * (1 - math.exp(-l * t)) for l in lams) / sum(lams)
    row = QUERIES["events_che_lru_hit"](spark, SF).first()
    assert row["n_objects"] == len(cnt)
    assert abs(row["t_char"] - t) < 1e-4
    assert abs(row["occupancy_residual"] - (occ - CACHE)) < 1e-5
    assert abs(row["overall_hit_ratio"] - hit) < 1e-6
    # Newton converged: the cache is exactly full in expectation
    assert abs(row["occupancy_residual"]) < 1e-3
    assert 0 < row["overall_hit_ratio"] < 1


def test_quorum_availability_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "event_type", "date_trunc('hour', ts) AS h"
    ).collect()
    hours = {}
    for r in rows:
        hours.setdefault(r["event_type"], set()).add(r["h"])
    got = {
        r["event_type"]: r
        for r in QUERIES["pipeline_quorum_availability"](spark, SF).collect()
    }
    for t, hs in hours.items():
        p = len(hs) / (30 * 24)
        q = 1 - p
        q3 = p**3 + 3 * p * p * q
        q5 = p**5 + 5 * p**4 * q + 10 * p**3 * q * q
        row = got[t]
        assert abs(row["replica_uptime"] - p) < 1e-6
        assert abs(row["quorum3"] - q3) < 1e-6
        assert abs(row["quorum5"] - q5) < 1e-6
        assert row["five_beats_three"] == (q5 > q3)
        # the classic threshold: above p=1/2 more replicas help
        if p > 0.5:
            assert row["five_beats_three"]
