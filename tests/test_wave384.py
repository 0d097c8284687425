"""Wave-384 pytest: BOCPD integer recursion replayed independently.

The registry's independent-replay invariant: the mirrored DuckDB oracle
shares the Spark expression's algebra, so this replay re-runs the exact
integer recursion in plain Python (third implementation) and also checks
the quantized posterior against an UNQUANTIZED float BOCPD to bound the
quantization error — proving the math, not just engine agreement.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.operators.wave384 import _MICRO, _R
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily_xs(spark):
    daily = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    days = sorted((r["day"], r["c"]) for r in daily)
    t = len(days)
    total = sum(c for _d, c in days)
    return [(d.isoformat(), 1 if c * t > total else 0) for d, c in days]


def _replay_integer(xs):
    w = [_MICRO]
    pre = [0]
    out = []
    for day, x in xs:
        nums = []
        t = len(pre) - 1
        for r in range(len(w)):
            ones = pre[t] - pre[t - r]
            nums.append(1 + ones if x == 1 else 1 + r - ones)
        growth = [
            (w[r] * nums[r] * 7) // ((2 + r) * 8) for r in range(len(w))
        ]
        cp0 = sum((w[r] * nums[r]) // ((2 + r) * 8) for r in range(len(w)))
        raw = [cp0] + growth[:_R]
        tot = sum(raw)
        w = [(y * _MICRO) // tot for y in raw]
        map_r = w.index(max(w))
        out.append((day, x, map_r, w[0]))
        pre.append(pre[-1] + x)
    return out


def _replay_float(xs):
    """Textbook (unquantized) BOCPD with the same prior/hazard/truncation."""
    w = [1.0]
    pre = [0]
    probs = []
    for _day, x in xs:
        t = len(pre) - 1
        pred = []
        for r in range(len(w)):
            ones = pre[t] - pre[t - r]
            p1 = (1 + ones) / (2 + r)
            pred.append(p1 if x == 1 else 1 - p1)
        growth = [w[r] * pred[r] * 7 / 8 for r in range(len(w))]
        cp0 = sum(w[r] * pred[r] / 8 for r in range(len(w)))
        raw = [cp0] + growth[:_R]
        tot = sum(raw)
        w = [y / tot for y in raw]
        probs.append(w[0])
        pre.append(pre[-1] + x)
    return probs


def test_bocpd_matches_pure_python_integer_replay(spark):
    rows = QUERIES["events_bocpd_bernoulli"](spark, SF).collect()
    xs = _daily_xs(spark)
    expected = _replay_integer(xs)
    assert len(rows) == len(expected) > 0
    for row, (day, x, map_r, cp_micro) in zip(rows, expected):
        assert row["day"] == day
        assert row["x"] == x
        assert row["map_runlength"] == map_r
        assert abs(row["cp_prob"] - round(cp_micro / _MICRO, 6)) <= 1e-9


def test_bocpd_quantization_tracks_float_recursion(spark):
    """The 1e6-grid recursion must stay within a loose band of the
    unquantized posterior — a transcription error in the integer algebra
    (wrong numerator, off-by-one in r) blows this up immediately."""
    xs = _daily_xs(spark)
    got = [cp / _MICRO for (_d, _x, _r, cp) in _replay_integer(xs)]
    want = _replay_float(xs)
    assert len(got) == len(want)
    for g, f in zip(got, want):
        assert abs(g - f) < 5e-4, (g, f)


def test_bocpd_posterior_properties(spark):
    rows = QUERIES["events_bocpd_bernoulli"](spark, SF).collect()
    for i, r in enumerate(rows):
        assert 0.0 <= r["cp_prob"] <= 1.0
        # posterior support: run length cannot exceed the observation
        # count (i+1) or the truncation cap (MAP itself may jump freely
        # within the support — it is an argmax, not a trajectory)
        assert 0 <= r["map_runlength"] <= min(i + 1, _R)
