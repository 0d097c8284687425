"""Wave-388 pytest: streaming BOCPD — cross-batch state vs pure Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from data_ingestor_web_app_spark.streaming.wave388 import _MICRO, _R

SF = "/root/testdata/sf0.001"


def _replay(xs):
    w, pre, out = [_MICRO], [0], []
    for day, x in xs:
        t = len(pre) - 1
        nums = []
        for r in range(len(w)):
            ones = pre[t] - pre[t - r]
            nums.append(1 + ones if x == 1 else 1 + r - ones)
        growth = [(w[r] * nums[r] * 7) // ((2 + r) * 8) for r in range(len(w))]
        cp0 = sum((w[r] * nums[r]) // ((2 + r) * 8) for r in range(len(w)))
        raw = [cp0] + growth[:_R]
        tot = sum(raw)
        w = [(y * _MICRO) // tot for y in raw]
        out.append((day, x, w.index(max(w)), w[0]))
        pre.append(pre[-1] + x)
    return out


def test_stream_bocpd_matches_online_replay(spark):
    rows = sorted(
        QUERIES["stream_bocpd_online"](spark, SF).collect(), key=lambda r: r["day"]
    )
    daily = sorted(
        (r["day"].isoformat(), r["c"])
        for r in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    # online indicator: strictly above the running mean INCLUDING today
    xs, s = [], 0
    for t, (day, c) in enumerate(daily, start=1):
        s += c
        xs.append((day, 1 if c * t > s else 0))
    expected = _replay(xs)
    assert len(rows) == len(expected) > 0
    for row, (day, x, map_r, cp_micro) in zip(rows, expected):
        assert row["day"] == day
        assert row["x"] == x
        assert row["map_runlength"] == map_r
        assert abs(row["cp_prob"] - round(cp_micro / _MICRO, 6)) <= 1e-9
    # the replay genuinely crossed micro-batches: 4 day-blocks over the
    # fixture month, so the posterior at the last day depends on state
    # carried through at least 3 batch boundaries (structurally guaranteed
    # by write_replay_files_by_day; assert the block count here)
    import os

    from data_ingestor_web_app_spark.streaming.wave388 import (
        write_replay_files_by_day,
    )

    src = write_replay_files_by_day(spark, SF, 4)
    assert len([p for p in os.listdir(src) if p.endswith(".parquet")]) == 4
