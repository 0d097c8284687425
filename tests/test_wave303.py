"""Wave-303: alpha-sampling weights vs a python replay (plus the
flattening monotonicity the exponent exists for); diagnostic ratios vs
direct confusion arithmetic and the DOR = LR+/LR- identity."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_temperature_sampling_matches_replay_and_flattens(spark):
    rows = {r["source"]: r for r in QUERIES["pipeline_temperature_sampling"](spark, SF).collect()}
    toks = Counter()
    for d in table(spark, SF, "documents").select("source", "text").collect():
        toks[d["source"]] += len(d["text"].split(" "))
    n = sum(toks.values())
    z7 = sum((t / n) ** 0.7 for t in toks.values())
    z3 = sum((t / n) ** 0.3 for t in toks.values())
    assert set(rows) == set(toks)
    for src, t in toks.items():
        r = rows[src]
        p = t / n
        assert r["tokens"] == t
        assert abs(r["p_raw"] - p) < 1e-6
        assert abs(r["q_alpha07"] - p**0.7 / z7) < 1e-6
        assert abs(r["q_alpha03"] - p**0.3 / z3) < 1e-6
        assert abs(r["epochs_alpha03"] - (p**0.3 / z3) * 100_000 / t) < 1e-3
    # weights are distributions
    for col in ("q_alpha07", "q_alpha03"):
        assert abs(sum(r[col] for r in rows.values()) - 1) < 1e-4
    # the exponent FLATTENS: smaller alpha moves every share toward uniform
    uni = 1 / len(toks)
    for r in rows.values():
        d_raw = abs(r["p_raw"] - uni)
        d_07 = abs(r["q_alpha07"] - uni)
        d_03 = abs(r["q_alpha03"] - uni)
        assert d_03 <= d_07 + 1e-9 <= d_raw + 2e-9


def test_diagnostic_ratios_match_confusion_arithmetic(spark):
    row = QUERIES["model_diagnostic_ratios"](spark, SF).first()
    data = [
        (int(round(r["value"] * 1000)), r["event_type"] == "purchase")
        for r in table(spark, SF, "events").select("value", "event_type").collect()
    ]
    ss = sorted(s for s, _ in data)
    t = ss[math.ceil(0.75 * len(ss)) - 1]
    tp = sum(1 for s, y in data if s > t and y)
    fp = sum(1 for s, y in data if s > t and not y)
    fn = sum(1 for s, y in data if s <= t and y)
    tn = sum(1 for s, y in data if s <= t and not y)
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    sens, spec = tp / (tp + fn), tn / (fp + tn)
    assert abs(row["lr_plus"] - sens / (1 - spec)) < 1e-4
    assert abs(row["lr_minus"] - (1 - sens) / spec) < 1e-4
    assert abs(row["diagnostic_or"] - (tp * tn) / (fp * fn)) < 1e-3
    # the Glas identity: DOR = LR+ / LR-
    assert abs(row["diagnostic_or"] - row["lr_plus"] / row["lr_minus"]) < 1e-2
