"""Wave-204: segmented regression vs a numpy lstsq grid; ULID vs python
bit assembly + monotonicity property."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_B32 = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def test_segmented_regression_numpy_grid(spark):
    row = QUERIES["model_segmented_regression"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    days = np.array(sorted(y))
    vals = np.array([y[d] for d in days], dtype=np.float64)

    def ols_sse(xs, ys):
        A = np.vstack([xs, np.ones_like(xs)]).T
        coef, res, *_ = np.linalg.lstsq(A, ys, rcond=None)
        pred = A @ coef
        return coef, ((ys - pred) ** 2).sum()

    best = None
    for bp in range(5, 26):
        lm = days < bp
        (sl, il), sse_l = ols_sse(days[lm].astype(float), vals[lm])
        (sr, ir), sse_r = ols_sse(days[~lm].astype(float), vals[~lm])
        tot = sse_l + sse_r
        if best is None or tot < best[0] - 1e-9:
            best = (tot, bp, sl, il, sr, ir)
    tot, bp, sl, il, sr, ir = best
    assert row["breakpoint"] == bp
    assert row["n_days"] == len(days)
    assert abs(row["total_sse"] - tot) < max(1.0, tot * 1e-6)
    assert abs(row["slope_left"] - sl) < 1e-3
    assert abs(row["intercept_left"] - il) < 1e-2
    assert abs(row["slope_right"] - sr) < 1e-3
    assert abs(row["intercept_right"] - ir) < 1e-2


def test_ulid_python_assembly(spark):
    rows = QUERIES["fn_ulid"](spark, SF).collect()
    ev = {r["event_id"]: r["ts"] for r in table(spark, SF, "events").select("event_id", "ts").collect()}
    assert len(rows) == len(ev)

    def b32(v, n):
        out = []
        for _ in range(n):
            v, d = divmod(v, 32)
            out.append(_B32[d])
        return "".join(reversed(out))

    for r in rows[:300]:
        ts = ev[r["event_id"]]
        from datetime import timezone

        ms = int(ts.replace(tzinfo=timezone.utc).timestamp() * 1000)
        # floor micros to ms exactly
        ms = (
            int(ts.replace(tzinfo=timezone.utc).timestamp()) * 1000
            + ts.microsecond // 1000
        )
        assert r["ms"] == ms
        h = hashlib.md5(str(r["event_id"]).encode()).hexdigest()
        ulid = (
            b32(ms, 10)
            + b32(int(h[0:10], 16), 8)
            + b32(int(h[10:20], 16), 8)
        )
        assert r["ulid"] == ulid
        assert len(r["ulid"]) == 26
    # lexicographic order == time order (on distinct ms values)
    seen = sorted(rows, key=lambda r: r["ulid"])
    ms_sorted = [r["ms"] for r in seen]
    assert ms_sorted == sorted(ms_sorted)
