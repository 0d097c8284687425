"""Wave-130 semantics: Holm vs BH dominance, SSIM bounds, bandit replay
reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_holm_monotone_and_dominated_by_bh_rejections(spark):
    holm = {r["nation"]: r for r in QUERIES["agg_holm_stepdown"](spark, SF).collect()}
    assert holm
    ordered = sorted(holm.values(), key=lambda r: r["k"])
    # adjusted p monotone nondecreasing in k, in [0, 1]
    adj = [r["holm_p"] for r in ordered]
    assert adj == sorted(adj)
    assert all(0 <= v <= 1 for v in adj)
    # FWER control is stricter than FDR: Holm rejections ⊆ BH rejections
    bh = QUERIES["agg_benjamini_hochberg"](spark, SF).collect()
    bh_rej = {r["nation"] for r in bh if r["rejected"]}
    holm_rej = {n for n, r in holm.items() if r["rejected"]}
    assert holm_rej <= bh_rej


def test_ssim_identity_bound_and_consistency(spark):
    rows = QUERIES["mm_image_ssim_shift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["ssim"] <= 1.0
        # shift is a per-row permutation: sums and sums-of-squares equal
        assert r["s1"] == r["s2"]
        assert r["q1"] == r["q2"]
        # Cauchy-Schwarz: p <= sqrt(q1*q2) = q1
        assert r["p"] <= r["q1"]


def test_bandit_replay_matches_python(spark):
    rows = {r["arm"]: r for r in QUERIES["events_bandit_replay_greedy"](spark, SF).collect()}
    log = sorted(
        (r["ts"], r["event_id"], r["event_type"], 1 if round(r["value"] * 1000) > 500 else 0)
        for r in table(spark, SF, "events")
        .select("ts", "event_id", "event_type", "value")
        .collect()
    )
    arms = sorted({t for _, _, t, _ in log})
    n = {a: 0 for a in arms}
    rw = {a: 0 for a in arms}
    stats = {a: [0, 0] for a in arms}  # pulls, reward of LOGGED history
    matches = {a: 0 for a in arms}
    mreward = {a: 0 for a in arms}
    logged = {a: 0 for a in arms}
    for _, _, arm, r in log:
        means = {
            a: (2.0 if stats[a][0] == 0 else stats[a][1] / stats[a][0]) for a in arms
        }
        best = max(means.values())
        chosen = min(a for a in arms if means[a] >= best)
        logged[arm] += 1
        if chosen == arm:
            matches[arm] += 1
            mreward[arm] += r
        stats[arm][0] += 1
        stats[arm][1] += r
    for a in arms:
        assert rows[a]["n_logged"] == logged[a]
        assert rows[a]["n_matches"] == matches[a]
        assert rows[a]["matched_reward"] == mreward[a]
