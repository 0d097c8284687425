"""Wave-354: ROC hull vs an integer cross-product replay; the
Provost-Fawcett theorem (cost optimum lies on the hull)."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
THR = list(range(20, 241, 20))
C_FP, C_FN = 1, 5


def test_roc_hull_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "value AS s",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos",
    ).collect()
    P = sum(r["pos"] for r in rows)
    N = len(rows) - P
    pts = {}
    for t in THR:
        tp = sum(1 for r in rows if r["s"] >= t and r["pos"])
        fp = sum(1 for r in rows if r["s"] >= t and not r["pos"])
        pts[t] = (tp, fp)
    allp = list(pts.values()) + [(0, 0), (P, N)]

    def on_hull(k):
        ktp, kfp = k
        for itp, ifp in allp:
            for jtp, jfp in allp:
                if ifp >= jfp:
                    continue
                if not (ifp <= kfp <= jfp):
                    continue
                if (ifp, itp) == (kfp, ktp) or (jfp, jtp) == (kfp, ktp):
                    continue
                if (ktp - itp) * (jfp - ifp) < (jtp - itp) * (kfp - ifp):
                    return False
        return True

    cost = {t: C_FP * fp + C_FN * (P - tp) for t, (tp, fp) in pts.items()}
    cmin = min(cost.values())
    bthr = min(t for t in THR if cost[t] == cmin)
    got = {
        r["threshold"]: r
        for r in QUERIES["model_roc_convex_hull"](spark, SF).collect()
    }
    assert set(got) == set(THR)
    for t in THR:
        tp, fp = pts[t]
        row = got[t]
        assert (row["tp"], row["fp"]) == (tp, fp)
        assert abs(row["tpr"] - tp / P) < 1e-6
        assert abs(row["fpr"] - fp / N) < 1e-6
        assert row["on_hull"] == on_hull((tp, fp)), t
        assert row["expected_cost"] == cost[t]
        assert row["cost_optimal"] == (t == bthr)
    # Provost-Fawcett (discrete form): because expected cost is linear
    # in (fp, tp), the min over hull vertices INCLUDING the corners is
    # never beaten by any operating point
    hull_costs = [
        cost[t] for t in THR if got[t]["on_hull"]
    ] + [C_FN * P, C_FP * N]
    assert min(hull_costs) <= cmin
    # hull membership is whatever the exact integer test says — at the
    # smallest fixture the full ROC can be convex, so no off-hull claim
