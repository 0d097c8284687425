"""Wave-254: Watson U^2 vs a sorted-order-statistic replay (plus the
rotation-invariance property — the defining feature), Fisher-Lee
circular correlation vs a cmath replay."""

from __future__ import annotations

import cmath
import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _watson(us):
    n = len(us)
    s = sorted(us)
    ubar = sum(s) / n
    ss = sum((u - (2 * i - 1) / (2 * n)) ** 2 for i, u in enumerate(s, 1))
    return ss - n * (ubar - 0.5) ** 2 + 1 / (12 * n)


def test_watson_u2_replay(spark):
    row = QUERIES["agg_watson_u2"](spark, SF).collect()[0]
    us = [
        r.u
        for r in table(spark, SF, "events")
        .selectExpr(
            "CAST(unix_micros(ts) % 86400000000 AS DOUBLE)"
            " / 86400000000.0 AS u"
        )
        .collect()
    ]
    u2 = _watson(us)
    assert row.n_obs == len(us)
    assert abs(row.mean_frac - round(sum(us) / len(us), 6)) < 1e-9
    assert abs(row.watson_u2 - round(u2, 6)) < 1e-6
    assert bool(row.nonuniform) == (u2 > 0.187)
    # rotation invariance: shifting every angle by 0.3 (mod 1) leaves
    # U^2 unchanged up to float noise — the property KS/CvM lack
    shifted = [(u + 0.3) % 1.0 for u in us]
    assert abs(_watson(shifted) - u2) < 1e-8


def test_circular_correlation_replay(spark):
    row = QUERIES["agg_circular_correlation"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('click','purchase')")
        .selectExpr(
            "user_id",
            "event_type",
            "2 * pi() * (CAST(unix_micros(ts) % 86400000000 AS DOUBLE)"
            " / 86400000000.0) AS th",
        )
        .collect()
    )
    vec = defaultdict(complex)
    for r in ev:
        vec[(r.user_id, r.event_type)] += cmath.exp(1j * r.th)
    users = {u for (u, t) in vec if t == "click"} & {
        u for (u, t) in vec if t == "purchase"
    }
    a = {u: cmath.phase(vec[(u, "click")]) for u in users}
    b = {u: cmath.phase(vec[(u, "purchase")]) for u in users}
    abar = cmath.phase(sum(cmath.exp(1j * v) for v in a.values()))
    bbar = cmath.phase(sum(cmath.exp(1j * v) for v in b.values()))
    sab = sum(math.sin(a[u] - abar) * math.sin(b[u] - bbar) for u in users)
    saa = sum(math.sin(a[u] - abar) ** 2 for u in users)
    sbb = sum(math.sin(b[u] - bbar) ** 2 for u in users)
    r_exp = sab / math.sqrt(saa * sbb)
    assert row.n_users == len(users)
    assert abs(row.circ_corr - round(r_exp, 6)) < 1e-5
    assert abs(row.z_approx - round(math.sqrt(len(users)) * r_exp, 6)) < 1e-4
    assert -1 - 1e-9 <= row.circ_corr <= 1 + 1e-9
