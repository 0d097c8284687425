"""Wave-153: TextRank vs python PageRank; HMM forward vs python."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _rha(x):
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_textrank_matches_python(spark):
    got = {r["keyword"]: (r["rank_micro"], r["rk"]) for r in QUERIES["text_textrank_keywords"](spark, SF).collect()}
    edges = set()
    for d in table(spark, SF, "documents").collect():
        toks = d["text"].split(" ")
        for a, b in zip(toks, toks[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    sym = defaultdict(set)
    for a, b in edges:
        sym[a].add(b)
        sym[b].add(a)
    deg = {u: len(vs) for u, vs in sym.items()}
    r = {u: 1000000 for u in deg}
    for _ in range(4):
        nr = {}
        for u in deg:
            acc = sum(r[v] / deg[v] for v in sym[u])
            nr[u] = 1000000 - 850000 + _rha(0.85 * acc)
        r = nr
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for rk, (u, score) in enumerate(top, 1):
        assert got[u] == (score, rk)


def test_hmm_forward_matches_python(spark):
    row = QUERIES["model_hmm_forward"](spark, SF).collect()[0]
    daily = sorted(
        (r["day"], r["x"])
        for r in table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    )
    xs = [x for _, x in daily]
    med = sorted((x, d) for d, x in daily)[(len(xs) + 1) // 2 - 1][0]
    obs = [1 if x > med else 0 for x in xs]
    T = ((900_000, 100_000), (200_000, 800_000))
    E = ((700_000, 300_000), (250_000, 750_000))
    a0 = _rha(500_000 * (E[0][0] if obs[0] == 0 else E[0][1]) / 1e6)
    a1 = _rha(500_000 * (E[1][0] if obs[0] == 0 else E[1][1]) / 1e6)
    shifts = 0
    for o in obs[1:]:
        if a0 + a1 < 1000:
            a0, a1, shifts = a0 * 1000, a1 * 1000, shifts + 1
        e0 = E[0][0] if o == 0 else E[0][1]
        e1 = E[1][0] if o == 0 else E[1][1]
        a0, a1 = (
            _rha((a0 * T[0][0] + a1 * T[1][0]) / 1e6 * e0 / 1e6),
            _rha((a0 * T[0][1] + a1 * T[1][1]) / 1e6 * e1 / 1e6),
        )
    assert row["n_obs"] == len(obs)
    assert row["alpha_calm_micro"] == a0
    assert row["alpha_busy_micro"] == a1
    assert row["norm_shifts"] == shifts
    assert 0.0 <= row["p_busy_final"] <= 1.0
