"""Wave-374 independent replays: Ripley's K by brute-force point-pair
distances (never touching the cell grid); join counts by directly walking
the lattice in Python."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
G = 32


def _points(spark):
    rows = (
        table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("nc"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
        )
        .collect()
    )
    return [(int(r["nc"]) % G, int(r["nv"]) % G) for r in rows]


def test_ripley_k_bruteforce_pairs(spark):
    pts = _points(spark)
    n = len(pts)
    got = {r["radius"]: r for r in QUERIES["spatial_ripley_k"](spark, SF).collect()}
    assert set(got) == {2, 4, 8}
    for r in (2, 4, 8):
        cnt = sum(
            1
            for i in range(n)
            for j in range(n)
            if i != j
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            <= r * r
        )
        row = got[r]
        assert row["n_pairs_leq_r"] == cnt
        k = G * G * cnt / (n * (n - 1))
        assert abs(row["k_hat"] - k) < 5.1e-7
        assert abs(row["l_hat"] - math.sqrt(k / math.pi)) < 5.1e-7
        assert row["k_csr"] == round(math.pi * r * r, 6)


def test_join_counts_lattice_walk(spark):
    pts = _points(spark)
    occ = {}
    for p in pts:
        occ[p] = occ.get(p, 0) + 1
    black = {
        (x, y): 1 if occ.get((x, y), 0) % 2 == 1 else 0
        for x in range(G)
        for y in range(G)
    }
    bb = bw = ww = 0
    for x in range(G):
        for y in range(G):
            for dx, dy in ((1, 0), (0, 1)):
                if x + dx < G and y + dy < G:
                    a, b = black[(x, y)], black[(x + dx, y + dy)]
                    bb += a * b
                    ww += (1 - a) * (1 - b)
                    bw += 1 if a != b else 0
    j = 2 * G * (G - 1)
    nb = sum(black.values())
    nw = G * G - nb
    nn = G * G * (G * G - 1)
    row = QUERIES["spatial_join_counts"](spark, SF).collect()[0]
    assert (row["bb"], row["bw"], row["ww"]) == (bb, bw, ww)
    assert bb + bw + ww == j
    assert (row["n_black"], row["n_white"]) == (nb, nw)
    assert row["e_bb"] == round(j * nb * (nb - 1) / nn, 4)
    assert row["e_bw"] == round(j * 2 * nb * nw / nn, 4)
    assert row["e_ww"] == round(j * nw * (nw - 1) / nn, 4)
