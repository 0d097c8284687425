"""Wave-287: Weibull plot vs a numpy median-rank replay (plus the
L-moment cross-estimator coherence when both see the same gaps),
sparsified triangles vs a hashlib coin replay."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
GRAPH_SF = "/root/testdata/sf0.01"


def test_weibull_plot_replay(spark):
    row = QUERIES["model_weibull_plot_fit"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) AS t", "event_id"
    ).collect()
    ts = [t for t, _ in sorted((r.t, r.event_id) for r in ev)]
    gaps = sorted(
        (b - a) / 1e6 for a, b in zip(ts, ts[1:]) if b > a
    )
    n = len(gaps)
    lx = np.log(gaps)
    ly = np.log(-np.log(1 - (np.arange(1, n + 1) - 0.3) / (n + 0.4)))
    beta, a = np.polyfit(lx, ly, 1)
    r2 = float(np.corrcoef(lx, ly)[0, 1] ** 2)
    assert row.n_gaps == n
    assert abs(row.weibull_shape - round(float(beta), 6)) < 1e-4
    assert abs(row.weibull_scale_s - round(math.exp(-a / beta), 6)) < 1e-3
    assert abs(row.plot_r2 - round(r2, 6)) < 1e-4
    assert bool(row.decreasing_hazard) == (beta < 1)
    assert 0 <= row.plot_r2 <= 1


def test_triangle_sparsification_replay(spark):
    row = QUERIES["graph_triangle_sparsification"](spark, GRAPH_SF).collect()[0]
    ev = table(spark, GRAPH_SF, "events").selectExpr(
        "user_id", "event_type", "date_trunc('minute', ts) AS m"
    ).collect()
    buckets = defaultdict(set)
    for r in ev:
        buckets[(r.event_type, r.m)].add(r.user_id)
    edges = set()
    for users in buckets.values():
        us = sorted(users)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                edges.add((us[i], us[j]))

    def coin(u, v):
        return (
            int(hashlib.md5(f"sp:{u}:{v}".encode()).hexdigest()[:8], 16) % 2
            == 0
        )

    kept = {(u, v) for (u, v) in edges if coin(u, v)}

    def tris(es):
        nodes = defaultdict(set)
        for u, v in es:
            nodes[u].add(v)
        t = 0
        for (u, v) in es:
            for w in nodes.get(v, ()):
                if (u, w) in es:
                    t += 1
        return t

    tx, tk = tris(edges), tris(kept)
    assert row.n_edges == len(edges)
    assert row.n_kept == len(kept)
    assert row.triangles_exact == tx
    assert row.triangles_sampled == tk
    assert abs(row.triangles_estimated - round(tk * 8.0, 6)) < 1e-9
    if tx:
        assert abs(row.rel_error - round((tk * 8 - tx) / tx, 6)) < 1e-9
    # the coin keeps roughly half the edges
    assert 0.3 * len(edges) < len(kept) < 0.7 * len(edges)
