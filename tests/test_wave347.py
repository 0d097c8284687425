"""Wave-347: Thurstone Case V vs a NormalDist.inv_cdf replay."""

from __future__ import annotations

from statistics import NormalDist

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_thurstone_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d",
        "event_type",
        "CAST(ROUND(value*100) AS LONG) AS y",
    ).collect()
    cell = {}
    for r in rows:
        s, n = cell.get((r["d"], r["event_type"]), (0, 0))
        cell[(r["d"], r["event_type"])] = (s + r["y"], n + 1)
    m = {k: s / n for k, (s, n) in cell.items()}
    types = sorted({t for _, t in cell})
    days = sorted({d for d, _ in cell})
    nd = NormalDist()
    scale, wins_tot = {}, {}
    for ti in types:
        zrow, tw = 0.0, 0
        for tj in types:
            if tj == ti:
                continue
            w = l = 0
            for d in days:
                if (d, ti) in m and (d, tj) in m:
                    if m[(d, ti)] > m[(d, tj)]:
                        w += 1
                    elif m[(d, ti)] < m[(d, tj)]:
                        l += 1
            p = min(59 / 60, max(1 / 60, w / (w + l)))
            zrow += nd.inv_cdf(p)
            tw += w
        scale[ti] = zrow / 5.0
        wins_tot[ti] = tw
    got = {
        r["event_type"]: r
        for r in QUERIES["model_thurstone_scaling"](spark, SF).collect()
    }
    for t in types:
        assert got[t]["total_wins"] == wins_tot[t]
        # Acklam |rel err| < 1.15e-9; 6dp rounding dominates
        assert abs(got[t]["thurstone_scale"] - scale[t]) < 1e-5
    order = sorted(types, key=lambda t: (-scale[t], t))
    for rk, t in enumerate(order, start=1):
        assert got[t]["rank"] == rk
    # Case V scales are centered-ish: sum of row means of a
    # skew-symmetric-ish z matrix stays small
    assert abs(sum(scale.values())) < 1.0
