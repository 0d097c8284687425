"""Wave-335: Bühlmann-Straub vs a python variance-components replay;
Bornhuetter-Ferguson vs a python triangle walk."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_buhlmann_straub_replay(spark):
    o = table(spark, SF, "orders").selectExpr(
        "o_custkey AS c_custkey", "CAST(ROUND(o_totalprice*100) AS LONG) AS y"
    )
    c = table(spark, SF, "customer").selectExpr("c_custkey", "c_nationkey")
    rows = (
        o.join(c, "c_custkey")
        .selectExpr("c_nationkey AS risk", "y")
        .collect()
    )
    grp = {}
    for r in rows:
        grp.setdefault(r["risk"], []).append(r["y"])
    k = len(grp)
    nn = sum(len(v) for v in grp.values())
    ss = sum(sum(v) for v in grp.values())
    within = sum(
        sum(y * y for y in v) - sum(v) ** 2 / len(v) for v in grp.values()
    )
    s2w = within / (nn - k)
    wmean2 = sum(len(v) * (sum(v) / len(v)) ** 2 for v in grp.values())
    sn2 = sum(len(v) ** 2 for v in grp.values())
    a = (wmean2 - ss * ss / nn - (k - 1) * s2w) / (nn - sn2 / nn)
    got = {
        r["nation"]: r
        for r in QUERIES["model_buhlmann_credibility"](spark, SF).collect()
    }
    gmean = ss / nn
    for risk, v in grp.items():
        n = len(v)
        z = n / (n + s2w / a)
        prem = (z * sum(v) / n + (1 - z) * gmean) / 100.0
        row = got[risk]
        assert row["n_orders"] == n
        assert abs(row["risk_mean"] - sum(v) / n / 100.0) < 1e-2
        assert abs(row["credibility_z"] - z) < 1e-5
        assert abs(row["credibility_premium"] - prem) < 0.02
        if a > 0:
            assert 0 < row["credibility_z"] < 1
        # shrinkage: premium lies between risk mean and grand mean
        lo = min(sum(v) / n, gmean) / 100.0 - 0.02
        hi = max(sum(v) / n, gmean) / 100.0 + 0.02
        if a > 0:
            assert lo <= row["credibility_premium"] <= hi


def test_bornhuetter_ferguson_replay(spark):
    lw = table(spark, SF, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey", "l_shipdate", "l_extendedprice"
    )
    ow = table(spark, SF, "orders").selectExpr("o_orderkey", "o_orderdate")
    li = (
        lw.join(ow, "o_orderkey")
        .selectExpr(
            "year(o_orderdate) AS origin",
            "year(l_shipdate) - year(o_orderdate) AS lag",
            "CAST(ROUND(l_extendedprice*100) AS LONG) AS c",
        )
        .collect()
    )
    cells = {}
    for r in li:
        if r["lag"] < 0:
            continue
        cells[(r["origin"], r["lag"])] = (
            cells.get((r["origin"], r["lag"]), 0) + r["c"]
        )
    tmax = max(o + l for o, l in cells)
    origins = sorted({o for o, _ in cells})
    cum = {}
    for o in origins:
        run = 0
        for l in sorted(l for oo, l in cells if oo == o):
            run += cells[(o, l)]
            if o + l <= tmax:
                cum[(o, l)] = run
    fac = {}
    for kk in sorted({l for _, l in cum}):
        num = sum(
            cum[(o, kk + 1)] for o in origins if (o, kk + 1) in cum and (o, kk) in cum
        )
        den = sum(
            cum[(o, kk)] for o in origins if (o, kk + 1) in cum and (o, kk) in cum
        )
        if den:
            fac[kk] = num / den
    latest = {o: max(l for oo, l in cum if oo == o) for o in origins}
    tail = {
        o: math.exp(sum(math.log(f) for kk, f in fac.items() if kk >= latest[o]))
        for o in origins
    }
    prem = {}
    for r in (
        table(spark, SF, "orders")
        .selectExpr(
            "year(o_orderdate) AS origin",
            "CAST(ROUND(o_totalprice*100) AS LONG) AS p",
        )
        .collect()
    ):
        prem[r["origin"]] = prem.get(r["origin"], 0) + r["p"]
    paid = {o: cum[(o, latest[o])] for o in origins}
    elr = sum(paid[o] * tail[o] for o in origins) / sum(
        prem[o] for o in origins
    )
    got = {
        r["origin_year"]: r
        for r in QUERIES["model_bornhuetter_ferguson"](spark, SF).collect()
    }
    for o in origins:
        row = got[o]
        unrep = 1 - 1 / tail[o]
        bf = (paid[o] + prem[o] * elr * unrep) / 100.0
        assert abs(row["paid_to_date"] - paid[o] / 100.0) < 1e-2
        assert abs(row["premium"] - prem[o] / 100.0) < 1e-2
        assert abs(row["elr"] - elr) < 1e-5
        assert abs(row["pct_unreported"] - unrep) < 1e-5
        assert abs(row["bf_ultimate"] - bf) < 0.05
        assert abs(row["cl_ultimate"] - paid[o] * tail[o] / 100.0) < 0.05
        # BF lies between paid and CL-style full projection directions
        assert row["bf_ultimate"] >= row["paid_to_date"] - 1e-9
