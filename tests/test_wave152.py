"""Wave-152: Kalman vs python replay; PID vs python reference."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

Q, R = 50_000, 400_000


def _rha(x):
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_kalman_matches_python_replay(spark):
    rows = {r["event_type"]: r for r in QUERIES["events_kalman_local_level"](spark, SF).collect()}
    series = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .select(
            "event_type",
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ms"),
            F.round(F.col("value") * 1000000).cast("long").alias("y"),
        )
        .collect()
    ):
        series[(r["event_type"], r["user_id"])].append((r["ms"], r["event_id"], r["y"]))
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for (et, _u), evs in series.items():
        evs.sort()
        ys = [y for _, _, y in evs]
        if len(ys) < 2:
            continue
        m, p, ai = ys[0], R, 0
        for y in ys[1:]:
            pp = p + Q
            k = _rha(1e6 * pp / (pp + R))
            innov = y - m
            ai += abs(innov)
            m += _rha(k * innov / 1e6)
            p = _rha((1000000 - k) * pp / 1e6)
        a = agg[et]
        a[0] += 1
        a[1] += m
        a[2] += p
        a[3] += ai
    for et, r in rows.items():
        assert r["n_series"] == agg[et][0]
        assert r["level_sum_micro"] == agg[et][1]
        assert r["var_sum_micro"] == agg[et][2]
        assert r["innovation_l1_micro"] == agg[et][3]
    # the filter variance converges below R (it always beats raw noise)
    for et, r in rows.items():
        assert r["var_sum_micro"] < R * r["n_series"]


def test_pid_matches_python(spark):
    r = QUERIES["events_pid_controller"](spark, SF).collect()[0]
    daily = sorted(
        (row["day"], row["x"])
        for row in (
            table(spark, SF, "events")
            .groupBy(F.col("ts").cast("date").alias("day"))
            .agg(F.count("*").alias("x"))
            .collect()
        )
    )
    es = [300 - x for _, x in daily]
    ie = 0
    us = []
    for i, e in enumerate(es):
        ie += e
        de = es[i] - es[i - 1] if i else 0
        us.append(500 * e + 100 * ie + 200 * de)
    assert r["n_days"] == len(es)
    assert r["abs_error_sum"] == sum(abs(e) for e in es)
    assert r["peak_control_milli"] == max(abs(u) for u in us)
    assert r["scale_up_days"] == sum(1 for u in us if u > 0)
    assert r["control_sum_milli"] == sum(us)
