"""Wave-329: causal shelf vs direct python replays of the 2x2 cells."""

from __future__ import annotations

import math
from datetime import date

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _units(spark):
    return table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS g",
        "CAST(ts AS DATE) AS d",
        "event_type",
        "CAST(ROUND(value*100) AS LONG) AS y",
    ).collect()


def test_did_four_means_replay(spark):
    us = _units(spark)
    cut = date(2024, 1, 16)
    cells = {}
    for u in us:
        key = (u["g"], 1 if u["d"] >= cut else 0)
        cells.setdefault(key, []).append(u["y"] / 100.0)
    mu = {k: sum(v) / len(v) for k, v in cells.items()}
    var = {
        k: (sum(x * x for x in v) / len(v) - mu[k] ** 2)
        * len(v)
        / (len(v) - 1)
        for k, v in cells.items()
    }
    did = (mu[(1, 1)] - mu[(1, 0)]) - (mu[(0, 1)] - mu[(0, 0)])
    se = math.sqrt(sum(var[k] / len(cells[k]) for k in cells))
    row = QUERIES["events_did_estimator"](spark, SF).first()
    assert row["n_obs"] == len(us)
    assert abs(row["delta_treated"] - (mu[(1, 1)] - mu[(1, 0)])) < 1e-6
    assert abs(row["delta_control"] - (mu[(0, 1)] - mu[(0, 0)])) < 1e-6
    assert abs(row["did"] - did) < 1e-6
    assert abs(row["did_se"] - se) < 1e-6
    assert abs(row["did_z"] - did / se) < 1e-5


def test_wald_iv_ratio_replay(spark):
    us = _units(spark)
    arms = {0: [], 1: []}
    for u in us:
        arms[u["g"]].append(
            (1 if u["event_type"] == "purchase" else 0, u["y"] / 100.0)
        )
    y1 = sum(y for _, y in arms[1]) / len(arms[1])
    y0 = sum(y for _, y in arms[0]) / len(arms[0])
    x1 = sum(x for x, _ in arms[1]) / len(arms[1])
    x0 = sum(x for x, _ in arms[0]) / len(arms[0])
    row = QUERIES["agg_wald_iv"](spark, SF).first()
    assert row["n_obs"] == len(us)
    assert abs(row["itt_effect"] - (y1 - y0)) < 1e-6
    assert abs(row["first_stage"] - (x1 - x0)) < 1e-6
    assert abs(row["wald_iv"] - (y1 - y0) / (x1 - x0)) < 1e-4


def test_risk_nnt_evalue_replay(spark):
    us = _units(spark)
    n1 = sum(1 for u in us if u["g"])
    n0 = len(us) - n1
    e1 = sum(1 for u in us if u["g"] and u["event_type"] == "error")
    e0 = sum(1 for u in us if not u["g"] and u["event_type"] == "error")
    p1, p0 = e1 / n1, e0 / n0
    rr_up = max(p1 / p0, p0 / p1)
    ev = rr_up + math.sqrt(rr_up * (rr_up - 1))
    row = QUERIES["agg_risk_nnt_evalue"](spark, SF).first()
    assert row["n_obs"] == len(us)
    assert abs(row["risk_exposed"] - p1) < 1e-6
    assert abs(row["risk_unexposed"] - p0) < 1e-6
    assert abs(row["risk_difference"] - (p1 - p0)) < 1e-6
    assert abs(row["nnt"] - 1 / abs(p1 - p0)) < 1e-4
    assert abs(row["risk_ratio"] - p1 / p0) < 1e-6
    assert abs(row["e_value"] - ev) < 1e-5
    # E-value >= RR* >= 1 always
    assert row["e_value"] >= rr_up - 1e-9 >= 1 - 1e-9
