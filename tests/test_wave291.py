"""Wave-291: Menzerath vs a numpy log-log replay, friendship paradox vs
a graph replay plus the Cauchy-Schwarz guarantee paradox_ratio >= 1."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
GRAPH_SF = "/root/testdata/sf0.01"


def test_menzerath_replay(spark):
    row = QUERIES["text_menzerath_fit"](spark, SF).collect()[0]
    docs = [r.text for r in table(spark, SF, "documents").collect()]
    lx, ly = [], []
    for t in docs:
        words = t.split(" ")
        n = len(words)
        mean_len = sum(len(w) for w in words) / n
        lx.append(math.log(n))
        ly.append(math.log(mean_len))
    b, a = np.polyfit(np.array(lx), np.array(ly), 1)
    r2 = float(np.corrcoef(lx, ly)[0, 1] ** 2)
    assert row.n_docs == len(docs)
    assert abs(row.menzerath_a - round(math.exp(a), 6)) < 1e-3
    assert abs(row.menzerath_b - round(float(b), 6)) < 1e-4
    assert abs(row.fit_r2 - round(r2, 6)) < 1e-4
    assert bool(row.law_direction_holds) == (b < 0)


def test_friendship_paradox_replay(spark):
    row = QUERIES["graph_friendship_paradox"](spark, GRAPH_SF).collect()[0]
    ev = table(spark, GRAPH_SF, "events").selectExpr(
        "user_id", "event_type", "date_trunc('minute', ts) AS m"
    ).collect()
    buckets = defaultdict(set)
    for r in ev:
        buckets[(r.event_type, r.m)].add(r.user_id)
    nbrs = defaultdict(set)
    for users in buckets.values():
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                nbrs[us[i]].add(us[j])
                nbrs[us[j]].add(us[i])
    deg = {u: len(v) for u, v in nbrs.items()}
    mean_deg = sum(deg.values()) / len(deg)
    mfd = {u: sum(deg[w] for w in v) / len(v) for u, v in nbrs.items()}
    mean_mfd = sum(mfd.values()) / len(mfd)
    frac = sum(1 for u in deg if mfd[u] > deg[u]) / len(deg)
    assert row.n_nodes == len(deg)
    assert abs(row.mean_degree - round(mean_deg, 6)) < 1e-6
    assert abs(row.mean_friend_degree - round(mean_mfd, 6)) < 1e-5
    assert abs(row.paradox_ratio - round(mean_mfd / mean_deg, 6)) < 1e-5
    assert abs(row.frac_less_popular - round(frac, 6)) < 1e-9
    # Feld's paradox is a Cauchy-Schwarz consequence: ratio >= 1 whenever
    # degrees vary
    assert row.paradox_ratio >= 1 - 1e-9
