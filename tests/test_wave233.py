"""Wave-233: 4-4-5 rollup vs a python calendar replay, BH step-up vs a
scipy-free p-value recompute using the same stdlib normal."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date
from statistics import NormalDist

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _fiscal(d) -> tuple[int, int]:
    if hasattr(d, "date") and not isinstance(d, date):
        d = d.date()
    elif hasattr(d, "hour"):
        d = d.date()
    fd = (d - date(1996, 2, 5)).days
    fyear = 1996 + math.floor(fd / 364.0)
    fweek = int(fd - 364 * math.floor(fd / 364.0)) // 7 + 1
    w2p = []
    for q in range(4):
        w2p += [q * 3 + 1] * 4 + [q * 3 + 2] * 4 + [q * 3 + 3] * 5
    return fyear, 12 if fweek > 52 else w2p[fweek - 1]


def test_fiscal_445_replay(spark):
    rows = {
        (r.fyear, r.fperiod): r
        for r in QUERIES["temporal_fiscal_445"](spark, SF).collect()
    }
    orders = table(spark, SF, "orders").select("o_orderdate", "o_totalprice").collect()
    agg = defaultdict(lambda: [0, 0.0])
    for o in orders:
        k = _fiscal(o.o_orderdate)
        agg[k][0] += 1
        agg[k][1] += o.o_totalprice
    assert set(rows) == set(agg)
    for k, (n, rev) in agg.items():
        assert rows[k].n_orders == n
        assert abs(rows[k].revenue - round(rev, 2)) < 0.02
    # 4-4-5 invariants: periods 1..12, each fiscal year span accounted for
    for fy, fp in rows:
        assert 1 <= fp <= 12
    assert sum(r.n_orders for r in rows.values()) == len(orders)


def test_bh_fdr_stepup_replay(spark):
    rows = {r.h: r for r in QUERIES["agg_bh_fdr"](spark, SF).collect()}
    assert len(rows) == 24
    ev = table(spark, SF, "events").selectExpr("hour(ts) AS h", "value").collect()
    vals = [r.value for r in ev]
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (len(vals) - 1))
    per_h = defaultdict(list)
    for r in ev:
        per_h[r.h].append(r.value)
    zs = {}
    for h, xs in per_h.items():
        zs[h] = round((sum(xs) / len(xs) - mu) / (sd / math.sqrt(len(xs))), 6)
    for h, r in rows.items():
        assert abs(r.z - zs[h]) < 1e-5
    # replay the BH step-up on two-sided p-values
    nd = NormalDist()
    ps = sorted(
        ((2 * (1 - nd.cdf(abs(z))), h) for h, z in zs.items()),
    )
    m, q = 24, 0.10
    kstar = 0
    for i, (p, _) in enumerate(ps, start=1):
        if p <= (i / m) * q:
            kstar = i
    rejected = {h for (p, h) in ps[:kstar]}
    for h, r in rows.items():
        assert r.bh_rejected == (h in rejected), (h, r.z)
    # Storey pi0: fraction of |z| below the p>0.5 threshold, scaled
    lam_z = nd.inv_cdf(1 - 0.25)
    pi0 = round(sum(1 for z in zs.values() if abs(z) < lam_z) / (m * 0.5), 6)
    for r in rows.values():
        assert abs(r.storey_pi0 - pi0) < 1e-6
        assert 0 <= r.storey_pi0 <= 2.0
