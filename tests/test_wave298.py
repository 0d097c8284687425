"""Wave-298: Bowker chi2 vs a python transition-matrix replay; Tsallis
ladder vs direct computation plus the q-family identities."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_bowker_matches_transition_replay(spark):
    row = QUERIES["agg_bowker_symmetry"](spark, SF).first()
    per_user: dict[int, list] = {}
    for r in table(spark, SF, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect():
        per_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    trans = Counter()
    for evs in per_user.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        trans[(evs[0][2], evs[-1][2])] += 1
    chi2, df = 0.0, 0
    types = sorted({t for pair in trans for t in pair})
    for i, f in enumerate(types):
        for l in types[i + 1 :]:
            n_fl, n_lf = trans.get((f, l), 0), trans.get((l, f), 0)
            if n_fl + n_lf > 0:
                df += 1
                chi2 += (n_fl - n_lf) ** 2 / (n_fl + n_lf)
    assert row["df"] == df
    assert abs(row["bowker_chi2"] - chi2) < 1e-6
    assert row["asymmetric_flow"] == (chi2 > row["crit_95"])


def test_tsallis_ladder_and_identities(spark):
    row = QUERIES["agg_tsallis_entropy"](spark, SF).first()
    cnt = Counter(
        r["event_type"]
        for r in table(spark, SF, "events").select("event_type").collect()
    )
    n = sum(cnt.values())
    ps = [c / n for c in cnt.values()]
    s_half = 2 * (sum(math.sqrt(p) for p in ps) - 1)
    s2 = 1 - sum(p * p for p in ps)
    s3 = (1 - sum(p**3 for p in ps)) / 2
    sh = -sum(p * math.log(p) for p in ps)
    assert row["n_types"] == len(ps) and row["n_events"] == n
    assert abs(row["tsallis_half"] - s_half) < 1e-6
    assert abs(row["tsallis_2"] - s2) < 1e-6
    assert abs(row["tsallis_3"] - s3) < 1e-6
    assert abs(row["shannon_nats"] - sh) < 1e-6
    # family identities: S_q decreases in q for q >= 1 on any distribution;
    # every S_q is bounded by the uniform maximum (k^(1-q)-1)/(1-q)
    k = len(ps)
    assert row["tsallis_2"] >= row["tsallis_3"] - 1e-9
    assert row["tsallis_2"] <= 1 - 1 / k + 1e-9
    assert row["tsallis_half"] <= 2 * (math.sqrt(k) - 1) + 1e-9
    # q->1 ordering: S_half >= Shannon >= S_2 on the nats scale
    assert row["tsallis_half"] >= row["shannon_nats"] - 1e-9
    assert row["shannon_nats"] >= row["tsallis_2"] - 1e-9
