"""Wave-146: IRV and Schulze vs python references on the same ballots."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _ballots(spark):
    per = defaultdict(dict)
    for r in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        per[r["day"]][r["event_type"]] = r["x"]
    ballots = []
    for day, d in per.items():
        ballots.append(sorted(d, key=lambda t: (-d[t], t)))
    return ballots


def test_irv_matches_python(spark):
    r = QUERIES["model_rank_irv_winner"](spark, SF).collect()[0]
    ballots = _ballots(spark)
    cands = sorted({c for b in ballots for c in b})
    eliminated = set()
    counts = {}
    for _ in range(len(cands) - 1):
        counts = defaultdict(int)
        for b in ballots:
            for c in b:
                if c not in eliminated:
                    counts[c] += 1
                    break
        loser = min((c for c in cands if c not in eliminated), key=lambda c: (counts.get(c, 0), c))
        eliminated.add(loser)
    survivors = [c for c in cands if c not in eliminated]
    assert len(survivors) == 1
    assert r["winner"] == survivors[0]
    assert r["n_ballots"] == len(ballots)
    assert r["final_votes"] == counts[survivors[0]]


def test_schulze_matches_python(spark):
    rows = {r["event_type"]: r for r in QUERIES["model_rank_schulze"](spark, SF).collect()}
    ballots = _ballots(spark)
    cands = sorted({c for b in ballots for c in b})
    d = defaultdict(int)
    for b in ballots:
        pos = {c: i for i, c in enumerate(b)}
        for i in cands:
            for j in cands:
                if i != j and pos[i] < pos[j]:
                    d[(i, j)] += 1
    p = {}
    for i in cands:
        for j in cands:
            if i != j:
                p[(i, j)] = d[(i, j)] if d[(i, j)] > d[(j, i)] else 0
    for k in cands:
        for i in cands:
            for j in cands:
                if i != j and i != k and j != k:
                    p[(i, j)] = max(p[(i, j)], min(p[(i, k)], p[(k, j)]))
    winners = 0
    for i in cands:
        wins = sum(1 for j in cands if j != i and p[(i, j)] >= p[(j, i)])
        assert rows[i]["beatpath_wins"] == wins
        assert rows[i]["schulze_winner"] == (wins == len(cands) - 1)
        winners += rows[i]["schulze_winner"]
    assert winners <= 1


def test_schulze_driver_loop_job_bound(spark):
    """VERDICT r7 item 5: the Schulze widest-path loop issues one Spark job
    per alternative — assert the total job count stays dimension-bounded
    (and that the in-code bound of 16 alternatives is enforced)."""
    sc = spark.sparkContext
    sc.setJobGroup("schulze-bound", "job-count audit", interruptOnCancel=False)
    before = set(sc.statusTracker().getJobIdsForGroup("schulze-bound"))
    QUERIES["model_rank_schulze"](spark, SF).collect()
    after = set(sc.statusTracker().getJobIdsForGroup("schulze-bound"))
    sc.setJobGroup(None, None)
    jobs = len(after - before)
    # <=16 candidates x a handful of jobs each (join + localCheckpoint
    # materialization; the exact per-candidate count floats with AQE
    # broadcast decisions across warm/cold sessions) + bounded setup jobs;
    # the invariant is jobs ~ O(|event_type|), NEVER O(rows)
    # (fixture: 8 types -> 35 jobs observed cold)
    assert 0 < jobs <= 16 * 12 + 8, f"schulze launched {jobs} jobs (bound 200)"
