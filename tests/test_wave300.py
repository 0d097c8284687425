"""Wave-300: Banzhaf swings vs a python coalition-lattice replay (plus the
49/49/2 canonical example); ballot audit vs a prefix walk."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _banzhaf(weights: dict) -> dict:
    players = sorted(weights)
    quota = sum(weights.values()) // 2 + 1
    eta = dict.fromkeys(players, 0)
    for r in range(len(players) + 1):
        for coal in combinations(players, r):
            cw = sum(weights[p] for p in coal)
            if cw < quota:
                continue
            for p in coal:
                if cw - weights[p] < quota:
                    eta[p] += 1
    return eta


def test_banzhaf_matches_lattice_replay(spark):
    rows = {r["event_type"]: r for r in QUERIES["model_banzhaf_power"](spark, SF).collect()}
    weights = Counter(
        r["event_type"] for r in table(spark, SF, "events").select("event_type").collect()
    )
    eta = _banzhaf(dict(weights))
    eta_sum = sum(eta.values())
    assert set(rows) == set(weights)
    for p, r in rows.items():
        assert r["weight"] == weights[p]
        assert r["n_swings"] == eta[p]
        assert abs(r["banzhaf_index"] - eta[p] / eta_sum) < 1e-6
    # indices are a distribution
    assert abs(sum(r["banzhaf_index"] for r in rows.values()) - 1) < 1e-4


def test_banzhaf_4949_2_example():
    """The canonical demonstration: 49/49/2 under majority quota gives all
    three players EQUAL power despite the weight imbalance."""
    eta = _banzhaf({"a": 49, "b": 49, "c": 2})
    assert eta["a"] == eta["b"] == eta["c"] > 0


def test_ballot_matches_prefix_walk(spark):
    row = QUERIES["events_ballot_problem"](spark, SF).first()
    days: dict = {}
    for r in table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type"
    ).collect():
        a, b = days.get(r["d"], (0, 0))
        days[r["d"]] = (a + (r["event_type"] == "click"), b + (r["event_type"] == "purchase"))
    ca = cb = lead = 0
    for d in sorted(days):
        ca += days[d][0]
        cb += days[d][1]
        lead += ca > cb
    n = len(days)
    assert row["n_days"] == n
    assert row["lead_days"] == lead
    assert row["total_a"] == ca and row["total_b"] == cb
    assert abs(row["lead_frac"] - lead / n) < 1e-6
    assert abs(row["ballot_probability"] - (ca - cb) / (ca + cb)) < 1e-6
    assert row["always_ahead"] == (lead == n)
