"""Wave-328: apportionment vs a python highest-averages replay;
Copeland vs a direct duel walk."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
S = 10


def _votes(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy("event_type")
        .count()
        .collect()
    )
    return {r["event_type"]: r["count"] for r in rows}


def _highest_averages(votes, divisors):
    quot = []
    for p, v in votes.items():
        for i, d in enumerate(divisors, start=1):
            quot.append((-v / d, -v, p, i))
    quot.sort()
    seats = {p: 0 for p in votes}
    for q in quot[:S]:
        seats[q[2]] += 1
    return seats


def test_apportionment_matches_python_ladder(spark):
    votes = _votes(spark)
    dh = _highest_averages(votes, list(range(1, S + 1)))
    sl = _highest_averages(votes, [2 * i - 1 for i in range(1, S + 1)])
    got = {
        r["party"]: r
        for r in QUERIES["model_seats_apportionment"](spark, SF).collect()
    }
    total = sum(votes.values())
    assert sum(r["seats_dhondt"] for r in got.values()) == S
    assert sum(r["seats_sainte_lague"] for r in got.values()) == S
    for p, v in votes.items():
        assert got[p]["votes"] == v
        assert got[p]["seats_dhondt"] == dh[p]
        assert got[p]["seats_sainte_lague"] == sl[p]
        assert abs(got[p]["vote_share"] - v / total) < 1e-6


def test_gallagher_enp_replay(spark):
    votes = _votes(spark)
    dh = _highest_averages(votes, list(range(1, S + 1)))
    total = sum(votes.values())
    vs = {p: v / total for p, v in votes.items()}
    ss = {p: dh[p] / S for p in votes}
    row = QUERIES["model_gallagher_enp"](spark, SF).first()
    g = math.sqrt(0.5 * sum((vs[p] - ss[p]) ** 2 for p in votes)) * 100
    lh = 0.5 * sum(abs(vs[p] - ss[p]) for p in votes) * 100
    assert row["n_parties"] == len(votes)
    assert abs(row["gallagher_index"] - g) < 1e-6
    assert abs(row["loosemore_hanby"] - lh) < 1e-6
    assert abs(row["enp_votes"] - 1 / sum(x * x for x in vs.values())) < 1e-6
    assert abs(row["enp_seats"] - 1 / sum(x * x for x in ss.values())) < 1e-6
    # ENP bounded by party count
    assert 1 - 1e-9 <= row["enp_votes"] <= len(votes) + 1e-9


def test_copeland_duels_replay(spark):
    # rebuild the three rankings exactly as the query does
    import pyspark.sql.functions as F

    m = (
        table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("v"),
            F.count_distinct("user_id").alias("u"),
        )
        .collect()
    )
    types = sorted(r["event_type"] for r in m)
    by = {r["event_type"]: r for r in m}

    def rank(key):
        order = sorted(types, key=lambda t: (-by[t][key], t))
        return {t: i + 1 for i, t in enumerate(order)}

    r1, r2, r3 = rank("n"), rank("v"), rank("u")
    got = {
        r["event_type"]: r
        for r in QUERIES["model_rank_copeland"](spark, SF).collect()
    }
    scores = {}
    for t in types:
        wins = losses = 0
        for o in types:
            if o == t:
                continue
            maj = sum(1 for rk in (r1, r2, r3) if rk[t] < rk[o])
            if maj >= 2:
                wins += 1
            elif 3 - maj >= 2:
                losses += 1
        scores[t] = wins - losses
        assert got[t]["wins"] == wins and got[t]["losses"] == losses
        assert got[t]["copeland_score"] == wins - losses
    best = max(scores.values())
    for t in types:
        assert got[t]["copeland_winner"] == (scores[t] == best)
