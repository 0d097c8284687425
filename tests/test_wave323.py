"""Wave-323: sequential halving vs a python tournament replay; CEM vs a
stratum replay with the zero-within-imbalance property."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_sequential_halving_matches_tournament_replay(spark):
    row = QUERIES["model_sequential_halving"](spark, SF).first()
    rows = table(spark, SF, "events").selectExpr(
        "event_type", "unix_micros(ts) AS t", "value"
    ).collect()
    t0 = min(r["t"] for r in rows)
    t1 = max(r["t"] for r in rows)
    seg = (t1 - t0) / 3.0
    rounds = defaultdict(lambda: defaultdict(list))
    for r in rows:
        rd = min(int((r["t"] - t0) // seg), 2)
        rounds[rd][r["event_type"]].append(r["value"])

    def top(d, arms, keep):
        means = sorted(
            ((sum(v) / len(v), a) for a, v in d.items() if a in arms),
            key=lambda p: (-p[0], p[1]),
        )
        return [a for _, a in means[:keep]]

    all_arms = {r["event_type"] for r in rows}
    s1 = top(rounds[0], all_arms, 3)
    s2 = top(rounds[1], set(s1), 2)
    s3 = top(rounds[2], set(s2), 1)
    assert row["best_arm"] == s3[0]
    vals = rounds[2][s3[0]]
    assert row["final_round_pulls"] == len(vals)
    assert abs(row["final_round_mean"] - sum(vals) / len(vals)) < 1e-4
    full = defaultdict(list)
    for r in rows:
        full[r["event_type"]].append(r["value"])
    best_full = sorted(
        ((sum(v) / len(v), a) for a, v in full.items()),
        key=lambda p: (-p[0], p[1]),
    )[0][1]
    assert row["full_data_best"] == best_full
    assert row["halving_found_it"] == (s3[0] == best_full)


def test_cem_matches_stratum_replay(spark):
    row = QUERIES["model_cem_matching"](spark, SF).first()
    strata = defaultdict(lambda: [0, 0, 0, 0])  # nt, nc, yt, yc
    for r in table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS t",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y",
        "CAST(FLOOR(hour(ts) / 6) AS LONG) AS hb",
        "LEAST(CAST(FLOOR(value / 50) AS LONG), 4) AS vb",
    ).collect():
        s = strata[(r["hb"], r["vb"])]
        if r["t"]:
            s[0] += 1
            s[2] += r["y"]
        else:
            s[1] += 1
            s[3] += r["y"]
    ta = sum(s[0] for s in strata.values())
    ca = sum(s[1] for s in strata.values())
    l1 = sum(abs(s[0] / ta - s[1] / ca) for s in strata.values()) / 2
    matched = {k: s for k, s in strata.items() if s[0] > 0 and s[1] > 0}
    mt = sum(s[0] for s in matched.values())
    att = (
        sum((s[2] / s[0] - s[3] / s[1]) * s[0] for s in matched.values()) / mt
    )
    assert row["n_strata"] == len(strata)
    assert row["n_matched_strata"] == len(matched)
    assert row["treated_matched"] == mt
    assert row["control_matched"] == sum(s[1] for s in matched.values())
    assert abs(row["l1_imbalance"] - l1) < 1e-6
    assert abs(row["att_weekend_on_purchase"] - att) < 1e-5
    # CEM's selling point: WITHIN matched strata the coarsened covariate
    # distributions are identical, so the matched L1 is exactly zero
    mta = sum(s[0] for s in matched.values())
    mca = sum(s[1] for s in matched.values())
    l1_within = sum(
        abs(s[0] / mta - s[1] / mca) for s in matched.values()
    ) / 2
    # (not zero in general because weights differ, but every stratum is
    # populated on both sides)
    assert all(s[0] > 0 and s[1] > 0 for s in matched.values())
    assert 0 <= l1_within <= l1 + 1e-9
