"""Wave-281: longest-run vs a sweep replay, Gray code vs a python bit
replay (plus the full-domain properties: round-trip on every id and
one-bit steps on ALL consecutive integers, not just the present ones)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_longest_run_replay(spark):
    row = QUERIES["events_longest_run_test"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) div 3600000000 AS h", "value"
    ).collect()
    acc = defaultdict(list)
    for r in ev:
        acc[r.h].append(r.value)
    xs = [sum(v) / len(v) for _, v in sorted(acc.items())]
    sv = sorted(xs)
    m = sv[math.ceil(len(sv) * 0.5) - 1]
    signs = [1 if x > m else 0 for x in xs]
    runs = []
    for s in signs:
        if runs and runs[-1][0] == s:
            runs[-1][1] += 1
        else:
            runs.append([s, 1])
    longest_any = max(r[1] for r in runs)
    longest_above = max((r[1] for r in runs if r[0] == 1), default=0)
    assert row.n_obs == len(xs)
    assert row.n_runs == len(runs)
    assert row.longest_above == longest_above
    assert row.longest_any == longest_any
    log2n = math.log2(len(xs))
    assert abs(row.expected_log2n - round(log2n, 6)) < 1e-9
    assert bool(row.run_anomaly) == (
        longest_any > log2n + 3 or longest_any < log2n - 3
    )


def _gray(b):
    return b ^ (b >> 1)


def _gray_inv(g):
    b = g
    for s in (1, 2, 4, 8, 16):
        b ^= b >> s
    return b


def test_gray_code_replay(spark):
    row = QUERIES["fn_gray_code"](spark, SF).collect()[0]
    uids = sorted(
        {r.user_id for r in table(spark, SF, "events").select("user_id").collect()}
    )
    assert row.n_ids == len(uids)
    assert row.n_roundtrip_ok == len(uids)  # identity must hold for ALL
    adj = [(a, b) for a, b in zip(uids, uids[1:]) if b == a + 1]
    onebit = sum(
        1 for a, b in adj if bin(_gray(a) ^ _gray(b)).count("1") == 1
    )
    assert row.n_adjacent_pairs == len(adj)
    assert row.n_adjacent_onebit == onebit == len(adj)  # the Gray property
    # library property on the whole 2^10 domain, replay-side
    for v in range(1024):
        assert _gray_inv(_gray(v)) == v
        if v:
            assert bin(_gray(v) ^ _gray(v - 1)).count("1") == 1
