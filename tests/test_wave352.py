"""Wave-352: GSP/VCG vs a per-lot sort replay (with the EOS revenue
dominance); within estimator vs a python demeaning replay."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
CTR = (100, 60, 30)


def test_gsp_vcg_replay(spark):
    rows = table(spark, SF, "lineitem").selectExpr(
        "l_partkey AS lot",
        "CAST(ROUND(l_extendedprice*100) AS LONG) AS bid",
        "l_orderkey",
        "l_linenumber",
    ).collect()
    lots = {}
    for r in rows:
        lots.setdefault(r["lot"], []).append(
            (-r["bid"], r["l_orderkey"], r["l_linenumber"])
        )
    c1, c2, c3 = CTR
    n = gsp_t = vcg_t = ge = 0
    for bs in lots.values():
        if len(bs) < 4:
            continue
        bs.sort()
        b = [-x[0] for x in bs[:4]]
        gsp = c1 * b[1] + c2 * b[2] + c3 * b[3]
        p1 = (c1 - c2) * b[1] + (c2 - c3) * b[2] + c3 * b[3]
        p2 = (c2 - c3) * b[2] + c3 * b[3]
        p3 = c3 * b[3]
        vcg = p1 + p2 + p3
        n += 1
        gsp_t += gsp
        vcg_t += vcg
        ge += gsp >= vcg
    row = QUERIES["model_gsp_vcg_auction"](spark, SF).first()
    assert row["n_auctions"] == n
    assert abs(row["gsp_revenue"] - gsp_t / 1e4) < 0.011
    assert abs(row["vcg_revenue"] - vcg_t / 1e4) < 0.011
    assert abs(row["gsp_over_vcg"] - gsp_t / vcg_t) < 1e-6
    # Edelman-Ostrovsky-Schwarz: GSP revenue dominates VCG per lot
    assert row["n_gsp_ge_vcg"] == n
    assert row["gsp_over_vcg"] >= 1


def test_fixed_effects_within_replay(spark):
    o = table(spark, SF, "orders").selectExpr(
        "o_custkey AS c_custkey",
        "year(o_orderdate) * 12 + month(o_orderdate) AS x",
        "CAST(CAST(ROUND(o_totalprice*100) AS LONG) / 100.0 AS DOUBLE) AS y",
    )
    c = table(spark, SF, "customer").selectExpr("c_custkey", "c_nationkey")
    rows = o.join(c, "c_custkey").selectExpr(
        "c_nationkey AS ent", "CAST(x AS DOUBLE) AS x", "y"
    ).collect()
    n = len(rows)
    mx = sum(r["x"] for r in rows) / n
    my = sum(r["y"] for r in rows) / n
    sxy = sum(r["x"] * r["y"] for r in rows)
    sxx = sum(r["x"] * r["x"] for r in rows)
    b_pool = (sxy - n * mx * my) / (sxx - n * mx * mx)
    gm = {}
    for r in rows:
        sx, sy, c2 = gm.get(r["ent"], (0.0, 0.0, 0))
        gm[r["ent"]] = (sx + r["x"], sy + r["y"], c2 + 1)
    gmean = {e: (sx / c2, sy / c2) for e, (sx, sy, c2) in gm.items()}
    wxy = sum(
        (r["x"] - gmean[r["ent"]][0]) * (r["y"] - gmean[r["ent"]][1])
        for r in rows
    )
    wxx = sum((r["x"] - gmean[r["ent"]][0]) ** 2 for r in rows)
    b_within = wxy / wxx
    row = QUERIES["model_fixed_effects_within"](spark, SF).first()
    assert row["n_obs"] == n
    assert row["n_entities"] == len(gm)
    assert abs(row["slope_pooled"] - b_pool) < 1e-5
    assert abs(row["slope_within"] - b_within) < 1e-5
    assert abs(row["fe_adjustment"] - (b_pool - b_within)) < 1e-5
