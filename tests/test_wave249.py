"""Wave-249: k-sample AD vs a per-observation EDF replay (independent of
the engine's grouped-grid construction) with the brute-force O(N^2)
double-harmonic g, and Conover squared ranks vs a sorted-midrank
replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _groups(spark):
    rows = table(spark, SF, "events").select("event_type", "value").collect()
    per = defaultdict(list)
    for r in rows:
        per[r.event_type].append(r.value)
    return per


def test_ad_ksample_replay(spark):
    row = QUERIES["agg_ad_ksample"](spark, SF).collect()[0]
    per = _groups(spark)
    k = len(per)
    nn = sum(len(v) for v in per.values())
    pooled = sorted({x for v in per.values() for x in v})
    mult = defaultdict(int)
    for v in per.values():
        for x in v:
            mult[x] += 1
    a2 = 0.0
    for gi, v in per.items():
        ni = len(v)
        sv = sorted(v)
        b = 0
        m = 0
        vi = 0
        for z in pooled:
            while vi < len(sv) and sv[vi] <= z:
                m += 1
                vi += 1
            b += mult[z]
            if b < nn:
                a2 += (1.0 / ni) * mult[z] * (nn * m - ni * b) ** 2 / (
                    nn * b * (nn - b)
                )
    hh = sum(1.0 / len(v) for v in per.values())
    h = sum(1.0 / i for i in range(1, nn))
    g = sum(
        1.0 / ((nn - i) * j)
        for i in range(1, nn - 1)
        for j in range(i + 1, nn)
    )
    ca = (4 * g - 6) * (k - 1) + (10 - 6 * g) * hh
    cb = (
        (2 * g - 4) * k * k
        + 8 * h * k
        + (2 * g - 14 * h - 4) * hh
        - 8 * h
        + 4 * g
        - 6
    )
    cc = (
        (6 * h + 2 * g - 2) * k * k
        + (4 * h - 4 * g + 6) * k
        + (2 * h - 6) * hh
        + 4 * h
    )
    cd = (2 * h + 6) * k * k - 4 * h * k
    var = (ca * nn**3 + cb * nn**2 + cc * nn + cd) / (
        (nn - 1) * (nn - 2) * (nn - 3)
    )
    t = (a2 - (k - 1)) / math.sqrt(var)
    assert row.n_obs == nn and row.n_groups == k
    assert abs(row.a2kn - round(a2, 6)) < 1e-4
    assert abs(row.var_a2 - round(var, 6)) < 1e-4
    assert abs(row.t_stat - round(t, 6)) < 1e-3
    assert row.var_a2 > 0


def test_conover_squared_ranks_replay(spark):
    row = QUERIES["agg_conover_squared_ranks"](spark, SF).collect()[0]
    per = _groups(spark)
    devs = []  # (group, |x - median_g|)
    for gi, v in per.items():
        sv = sorted(v)
        med = sv[math.ceil(len(sv) * 0.5) - 1]
        devs.extend((gi, abs(x - med)) for x in v)
    nn = len(devs)
    svals = sorted(d for _, d in devs)
    # midranks
    rank_of = {}
    i = 0
    while i < nn:
        j = i
        while j < nn and svals[j] == svals[i]:
            j += 1
        rank_of[svals[i]] = (i + 1 + j) / 2.0
        i = j
    u = {gv: [] for gv in per}
    for gi, d in devs:
        u[gi].append(rank_of[d] ** 2)
    all_u = [x for v in u.values() for x in v]
    ubar = sum(all_u) / nn
    d2 = (sum(x * x for x in all_u) - nn * ubar * ubar) / (nn - 1)
    ss = sum(sum(v) ** 2 / len(v) for v in u.values())
    t = (ss - nn * ubar * ubar) / d2
    assert row.n_obs == nn and row.n_groups == len(per)
    assert abs(row.mean_sq_rank - round(ubar, 6)) < 1e-3
    assert abs(row.t_stat - round(t, 6)) < 1e-4
    assert bool(row.scale_differs) == (t > 9.487729)
    assert row.t_stat >= 0
