"""Wave-255: temporal align vs an event-sweep python replay (plus the
conservation property: total aligned time equals each user's span from
first joint-defined boundary to last boundary), Spiegelhalter z vs a
from-scratch probability replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_temporal_align_replay(spark):
    rows = {
        (r.click_band, r.purchase_band): r
        for r in QUERIES["join_temporal_align"](spark, SF).collect()
    }
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('click','purchase')")
        .selectExpr(
            "user_id", "unix_micros(ts) AS t", "event_type",
            "CAST(FLOOR(value / 25) AS BIGINT) AS band",
        )
        .collect()
    )
    per = defaultdict(list)
    for r in ev:
        per[r.user_id].append((r.t, r.event_type, r.band))
    agg = defaultdict(lambda: [0, 0, set()])
    span = 0
    for uid, evs in per.items():
        evs.sort(key=lambda x: (x[0], x[1] != "click"))
        cb = pb = None
        for (t, et, band), nxt in zip(evs, evs[1:] + [None]):
            if et == "click":
                cb = band
            else:
                pb = band
            if nxt is None:
                break
            dur = nxt[0] - t
            if dur > 0 and cb is not None and pb is not None:
                k = (cb, pb)
                agg[k][0] += 1
                agg[k][1] += dur
                agg[k][2].add(uid)
                span += dur
    assert set(rows) == set(agg)
    for k, (n, dur, users) in agg.items():
        assert rows[k].n_intervals == n, k
        assert rows[k].total_secs == dur // 1000000, k
        assert rows[k].n_users == len(users), k
    # conservation: engine total micros == swept total micros (to the
    # second-floor granularity used in the output, allow slack of one
    # second per interval)
    got = sum(r.total_secs for r in rows.values())
    assert abs(got - span // 1000000) <= sum(r.n_intervals for r in rows.values())


def test_spiegelhalter_z_replay(spark):
    row = QUERIES["model_spiegelhalter_z"](spark, SF).collect()[0]
    os_ = table(spark, SF, "orders").selectExpr(
        "CAST(o_orderstatus = 'F' AS INT) AS y",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents",
    ).collect()
    cents = [r.cents for r in os_]
    n = len(cents)
    mean = sum(cents) / n
    sd = math.sqrt(sum(c * c for c in cents) / n - mean * mean)
    num = den = brier = 0.0
    for r in os_:
        p = 1 / (1 + math.exp(-(-1.0 + 0.5 * (r.cents - mean) / sd)))
        brier += (r.y - p) ** 2
        num += (r.y - p) * (1 - 2 * p)
        den += (1 - 2 * p) ** 2 * p * (1 - p)
    z = num / math.sqrt(den)
    assert row.n_obs == n
    assert abs(row.brier - round(brier / n, 6)) < 1e-5
    assert abs(row.spiegelhalter_z - round(z, 6)) < 1e-3
    assert bool(row.miscalibrated) == (abs(z) > 1.959964)
