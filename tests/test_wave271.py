"""Wave-271: (B, M) plane vs a python interarrival replay (plus the
range bounds B in (-1, 1), M in [-1, 1]), transitivity audit vs a
brute-force Jaccard graph replay."""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_goh_barabasi_replay(spark):
    rows = {r.event_type: r for r in QUERIES["events_goh_barabasi"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "event_type", "unix_micros(ts) AS t", "event_id"
    ).collect()
    per = defaultdict(list)
    for r in ev:
        per[r.event_type].append((r.t, r.event_id))
    for et, pts in per.items():
        pts.sort()
        tau = [(b[0] - a[0]) / 1e6 for a, b in zip(pts, pts[1:])]
        n = len(tau)
        mu = sum(tau) / n
        sd = math.sqrt(sum(t * t for t in tau) / n - mu * mu)
        b_coef = (sd - mu) / (sd + mu)
        xs, ys = tau[:-1], tau[1:]
        np_ = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        m = (np_ * sxy - sx * sy) / math.sqrt(
            (np_ * sxx - sx * sx) * (np_ * syy - sy * sy)
        )
        r = rows[et]
        assert r.n_intervals == n
        assert abs(r.mean_tau_s - round(mu, 6)) < 1e-6
        assert abs(r.burstiness_b - round(b_coef, 6)) < 1e-5
        assert abs(r.memory_m - round(m, 6)) < 1e-5
        assert -1 < r.burstiness_b < 1
        assert -1 - 1e-9 <= r.memory_m <= 1 + 1e-9


def test_transitivity_audit_replay(spark):
    row = QUERIES["dedup_transitivity_audit"](spark, SF).collect()[0]
    docs = table(spark, SF, "documents").collect()
    items = [
        (d.doc_id, d.lang, len(d.text.split(" ")) // 20, frozenset(d.text.split(" ")))
        for d in docs
    ]
    blocks = defaultdict(list)
    for did, lang, lb, toks in items:
        blocks[(lang, lb)].append((did, toks))
    edges = set()
    for members in blocks.values():
        for (u, ta), (v, tb) in combinations(sorted(members), 2):
            inter = len(ta & tb)
            union = len(ta) + len(tb) - inter
            if inter >= 0.5 * union:
                edges.add((u, v))
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    wedges = sum(k * (k - 1) // 2 for k in deg.values())
    tris = sum(
        1
        for (u, v) in edges
        for w in deg
        if w > v and (v, w) in edges and (u, w) in edges
    )
    closure = 1.0 if wedges == 0 else 3 * tris / wedges
    assert row.n_pairs == len(edges)
    assert row.n_wedges == wedges
    assert row.n_triangles == tris
    assert abs(row.closure - round(closure, 6)) < 1e-6
    assert 0 <= row.closure <= 1 + 1e-9
