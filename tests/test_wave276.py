"""Wave-276: Qini vs a decile-sweep replay (plus the endpoint identity:
curve and random line meet at decile 10), variance-time curve vs a
bucket-count replay (plus a Hurst fit cross-check in a sane range)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_qini_replay(spark):
    rows = {r.decile: r for r in QUERIES["model_qini_uplift"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "CAST(dayofweek(ts) IN (1,7) AS INT) AS t",
        "CAST(event_type = 'purchase' AS INT) AS y",
        "CAST(unix_micros(ts) % 86400000000 AS DOUBLE)"
        " / 86400000000.0 AS score",
        "event_id",
    ).collect()
    ordered = sorted(ev, key=lambda r: (-r.score, r.event_id))
    n = len(ordered)
    # NTILE semantics: first (n % 10) tiles get ceil(n/10)
    base, extra = divmod(n, 10)
    idx = 0
    yt = yc = nt = nc = 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        for r in ordered[idx : idx + size]:
            if r.t:
                nt += 1
                yt += r.y
            else:
                nc += 1
                yc += r.y
        idx += size
        row = rows[d]
        assert row.cum_treated_conv == yt, d
        assert row.cum_control_conv == yc, d
        assert abs(row.qini - round(yt - yc * nt / nc, 6)) < 1e-6
    # endpoint identity: at decile 10 the random line equals the curve
    assert abs(rows[10].qini - rows[10].random_line) < 1e-6


def test_variance_time_replay(spark):
    rows = {r.window_s: r for r in QUERIES["events_variance_time_curve"](spark, SF).collect()}
    ts = [r.t for r in table(spark, SF, "events").selectExpr("unix_micros(ts) AS t").collect()]
    vmrs = {}
    for w in (60, 300, 900, 3600):
        buckets = defaultdict(int)
        for t in ts:
            buckets[t // (w * 1000000)] += 1
        cs = list(buckets.values())
        n = len(cs)
        mu = sum(cs) / n
        v = sum(c * c for c in cs) / n - mu * mu
        r = rows[w]
        assert r.n_windows == n, w
        assert abs(r.mean_count - round(mu, 6)) < 1e-9
        assert abs(r.vmr - round(v / mu, 6)) < 1e-6
        vmrs[w] = v / mu
    # Hurst from the VMR slope: H = (slope + 1)/2 must land in (0, 1.2)
    xs = np.log([60, 300, 900, 3600])
    ys = np.log([max(vmrs[w], 1e-9) for w in (60, 300, 900, 3600)])
    slope = float(np.polyfit(xs, ys, 1)[0])
    h = (slope + 1) / 2
    assert -0.2 < h < 1.3
