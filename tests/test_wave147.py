"""Wave-147: fairness metrics vs python reference, gap consistency."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _groups(spark):
    custs = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in table(spark, SF, "customer").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sel, tp, fp, pos
    for r in table(spark, SF, "orders").collect():
        g = custs[r["o_custkey"]]
        y = 1 if r["o_orderstatus"] == "F" else 0
        yhat = 1 if r["o_totalprice"] > 150000 else 0
        a = agg[g]
        a[0] += 1
        a[1] += yhat
        a[2] += y and yhat
        a[3] += (1 - y) and yhat
        a[4] += y
    return agg


def test_group_metrics_match_python(spark):
    rows = {r["grp"]: r for r in QUERIES["model_fairness_group_metrics"](spark, SF).collect()}
    agg = _groups(spark)
    assert set(rows) == set(agg)
    for g, (n, sel, tp, fp, pos) in agg.items():
        r = rows[g]
        assert (r["n"], r["sel"], r["pos"]) == (n, sel, pos)
        assert abs(r["selection_rate"] - sel / n) < 1e-6
        assert abs(r["tpr"] - tp / pos) < 1e-6
        assert abs(r["fpr"] - fp / (n - pos)) < 1e-6


def test_parity_gaps_consistent_with_group_metrics(spark):
    gaps = QUERIES["model_fairness_parity_gaps"](spark, SF).collect()[0]
    agg = _groups(spark)
    srs = [sel / n for n, sel, _tp, _fp, _pos in agg.values()]
    tprs = [tp / pos for _n, _sel, tp, _fp, pos in agg.values()]
    assert gaps["n_groups"] == len(agg)
    assert abs(gaps["demographic_parity_gap"] - (max(srs) - min(srs))) < 1e-6
    assert abs(gaps["disparate_impact_ratio"] - min(srs) / max(srs)) < 1e-6
    assert abs(gaps["equal_opportunity_gap"] - (max(tprs) - min(tprs))) < 1e-6
    assert gaps["passes_four_fifths"] == (min(srs) / max(srs) >= 0.8)
    assert 0 <= gaps["disparate_impact_ratio"] <= 1.0
