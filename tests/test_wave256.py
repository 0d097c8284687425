"""Wave-256: kernel herding vs a numpy greedy replay (plus the O(1/T)
moment-matching property: mmd2 decreases), Cucconi vs a midrank replay
(plus its symmetry property U <-> V under sample reversal is reflected
in rho)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kernel_herding_replay(spark):
    rows = sorted(
        QUERIES["sim_kernel_herding"](spark, SF).collect(),
        key=lambda r: r.step,
    )
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in table(spark, SF, "embeddings").collect()
    }
    mu = np.mean(list(emb.values()), axis=0)
    chosen = []
    w = mu.copy()
    for step in range(1, 4):
        best = min(
            ((vid, float(v @ w)) for vid, v in emb.items() if vid not in chosen),
            key=lambda t: (-t[1], t[0]),
        )
        chosen.append(best[0])
        r = rows[step - 1]
        assert r.vec_id == best[0], step
        assert abs(r.score - round(best[1], 6)) < 1e-4
        gap = mu - np.mean([emb[c] for c in chosen], axis=0)
        assert abs(r.mmd2_to_mean - round(float(gap @ gap), 6)) < 1e-5
        w = w + mu - emb[best[0]]
    # herding's point: the selected mean closes in on mu monotonically
    # in the first steps of a well-spread corpus
    assert rows[0].mmd2_to_mean >= rows[1].mmd2_to_mean >= rows[2].mmd2_to_mean - 1e-9


def test_cucconi_replay(spark):
    row = QUERIES["agg_cucconi_test"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('view','click')")
        .select("event_type", "value")
        .collect()
    )
    vals = [r.value for r in ev]
    order = sorted(vals)
    # midranks
    mr = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        mr[order[i]] = (i + 1 + j) / 2
        i = j
    n1 = sum(1 for r in ev if r.event_type == "view")
    s_ranks = [mr[r.value] for r in ev if r.event_type == "click"]
    n2, nn = len(s_ranks), len(ev)
    s2 = sum(s * s for s in s_ranks)
    s2c = sum((nn + 1 - s) ** 2 for s in s_ranks)
    den = math.sqrt(n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5)
    u = (6 * s2 - n2 * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * s2c - n2 * (nn + 1) * (2 * nn + 1)) / den
    rho = 2 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.u - round(u, 6)) < 1e-5
    assert abs(row.v - round(v, 6)) < 1e-5
    assert abs(row.rho - round(rho, 6)) < 1e-9
    assert abs(row.c_stat - round(c, 6)) < 1e-4
    assert bool(row.location_scale_differs) == (c > 2.995732)
    assert row.c_stat >= 0 and -1 < row.rho < 0  # rho is negative for all N
