"""Wave-342: rendezvous hashing vs a python argmax replay + the
minimal-disruption property."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
N, M31 = 8, 2147483648


def _score(k, node, w):
    u = ((k * 2654435761 + node * 40503) % M31 + 1) / (M31 + 2.0)
    return -w / math.log(u)


def test_rendezvous_replay_and_minimal_disruption(spark):
    keys = [
        r["event_id"]
        for r in table(spark, SF, "events").select("event_id").collect()
    ]
    weights = {n: 1 + n % 3 for n in range(N)}
    win_all, win_m7 = {}, {}
    for k in keys:
        scores = sorted(
            ((_score(k, n, weights[n]), -n) for n in range(N)), reverse=True
        )
        win_all[k] = -scores[0][1]
        scores7 = sorted(
            ((_score(k, n, weights[n]), -n) for n in range(N) if n != 7),
            reverse=True,
        )
        win_m7[k] = -scores7[0][1]
    got = {
        r["node"]: r
        for r in QUERIES["pipeline_rendezvous_hashing"](spark, SF).collect()
    }
    assert len(got) == N
    nk = len(keys)
    wsum = sum(weights.values())
    for n in range(N):
        r = got[n]
        cnt = sum(1 for k in keys if win_all[k] == n)
        cnt7 = sum(1 for k in keys if win_m7[k] == n)
        assert r["weight"] == weights[n]
        assert r["n_keys"] == cnt
        assert r["n_keys_after"] == cnt7
        assert abs(r["share"] - cnt / nk) < 1e-6
        assert abs(r["expected_share"] - weights[n] / wsum) < 1e-6
        # minimal disruption: live nodes only gain node-7 refugees
        assert r["stolen_from_live"] == 0
    # every key of node 7 landed somewhere among the live nodes
    assert got[7]["n_keys_after"] == 0
    assert sum(got[n]["n_keys_after"] for n in range(N)) == nk
    moved = sum(1 for k in keys if win_all[k] != win_m7[k])
    assert moved == got[7]["n_keys"]
