"""Wave-173: MCC/F1 vs sklearn-free recomputation; PR/AP step-integral
identities; Somers' D vs Kendall consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _labeled(spark):
    return [
        (int(round(r["value"] * 1000)), r["event_type"] == "purchase")
        for r in table(spark, SF, "events").select("value", "event_type").collect()
    ]


def test_mcc_matches_bruteforce(spark):
    r = QUERIES["model_mcc_score"](spark, SF).collect()[0]
    data = _labeled(spark)
    import math

    ss = sorted(s for s, _ in data)
    t = ss[math.ceil(0.75 * len(ss)) - 1]
    tp = sum(1 for s, y in data if s > t and y)
    fp = sum(1 for s, y in data if s > t and not y)
    fn = sum(1 for s, y in data if s <= t and y)
    tn = sum(1 for s, y in data if s <= t and not y)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r["mcc"] - mcc) < 1e-6
    assert abs(r["f1"] - 2 * tp / (2 * tp + fp + fn)) < 1e-6
    assert -1 <= r["mcc"] <= 1


def test_pr_curve_ap_identities(spark):
    rows = QUERIES["model_pr_curve_ap"](spark, SF).collect()
    assert rows
    ap = rows[0]["average_precision"]
    data = _labeled(spark)
    pos = sum(1 for _, y in data if y)
    base_rate = pos / len(data)
    for r in rows:
        assert 0 < r["precision_at"] <= 1
        assert 0 < r["recall_at"] <= 1
        assert abs(r["precision_at"] - r["tp"] / r["n_predicted"]) < 1e-6
        assert abs(r["recall_at"] - r["tp"] / pos) < 1e-6
        assert r["average_precision"] == ap
    # AP of any real scorer lies between 0 and 1; random scorer ~ base rate
    assert 0 < ap <= 1
    # recall reaches (near) 1 at the lowest emitted threshold
    assert max(r["recall_at"] for r in rows) > 0.9
    assert base_rate > 0


def test_somers_d_relates_to_kendall(spark):
    sd = QUERIES["agg_somers_d"](spark, SF).collect()[0]
    kt = QUERIES["agg_kendall_tau"](spark, SF).collect()[0]
    # identical pair universe (same daily frame)
    assert sd["n_pairs"] == kt["n_pairs"]
    assert sd["concordant"] == kt["concordant"]
    assert sd["discordant"] == kt["discordant"]
    assert -1 <= sd["somers_d_yx"] <= 1
    # |D| <= |tau_b| is not an identity, but sign must agree
    if kt["tau_b"] != 0:
        assert (sd["somers_d_yx"] > 0) == (kt["tau_b"] > 0)
