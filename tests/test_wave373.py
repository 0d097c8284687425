"""Wave-373 independent replays: Kadane recomputed with the classic
sequential DP (best-ending-here recurrence — NOT the prefix-sum identity
the builders use); Savitzky-Golay recomputed with numpy dot products of
the published weight vectors."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .orderBy("day")
        .collect()
    )
    return [r["day"] for r in rows], [r["c"] for r in rows]


def test_kadane_sequential_dp_replay(spark):
    days, cs = _daily(spark)
    n, s = len(cs), sum(cs)
    xs = [c * n - s for c in cs]
    best = cur = None
    best_end = None
    worst = wcur = None
    worst_end = None
    for i, v in enumerate(xs):
        cur = v if cur is None or cur < 0 else cur + v
        if best is None or cur > best:
            best, best_end = cur, days[i]
        wcur = v if wcur is None or wcur > 0 else wcur + v
        if worst is None or wcur < worst:
            worst, worst_end = wcur, days[i]
    got = QUERIES["events_kadane_subarray"](spark, SF).collect()[0]
    assert got["max_subarray_scaled"] == best
    assert got["min_subarray_scaled"] == worst
    assert got["best_end_day"] == best_end.isoformat()
    assert got["worst_end_day"] == worst_end.isoformat()
    assert got["n_days"] == n
    assert sum(xs) == 0  # exact demeaning invariant


def test_savitzky_golay_numpy_replay(spark):
    import numpy as np

    days, cs = _daily(spark)
    c = np.asarray(cs, dtype=np.int64)
    got = {
        r["day"]: r for r in QUERIES["fn_savitzky_golay"](spark, SF).collect()
    }
    w5 = np.array([-3, 12, 17, 12, -3], dtype=np.int64)
    w7 = np.array([-2, 3, 6, 7, 6, 3, -2], dtype=np.int64)
    assert len(got) == len(c) - 4  # interior of the 5-window
    for i in range(2, len(c) - 2):
        r = got[days[i].isoformat()]
        assert r["raw_count"] == cs[i]
        assert r["sg5_x35"] == int(w5 @ c[i - 2 : i + 3])
        assert r["sg5_smoothed"] == round(int(w5 @ c[i - 2 : i + 3]) / 35, 4)
        if 3 <= i < len(c) - 3:
            assert r["sg7_x21"] == int(w7 @ c[i - 3 : i + 4])
        else:
            assert r["sg7_x21"] is None
    # the SG filter preserves the mean of a linear ramp exactly: weights
    # sum to the denominator and are symmetric
    assert w5.sum() == 35 and w7.sum() == 21
