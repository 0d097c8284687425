"""Wave-379 independent replays: ASO epsilon via numpy quantile-free
order statistics on raw sorted arrays; canary exposure via python set
intersection of span sets."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
K = 100


def test_aso_order_statistic_replay(spark):
    rows = (
        table(spark, SF, "events")
        .select(
            F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0).alias("g"),
            F.round(F.col("value") * 1000).cast("long").alias("v"),
        )
        .collect()
    )
    xa = sorted(r["v"] for r in rows if r["g"] == 1)
    xb = sorted(r["v"] for r in rows if r["g"] == 0)

    def quantile(xs, i):
        # smallest v with rank >= ceil((2i-1)*n / 2K): 1-indexed order stat
        n = len(xs)
        r = -((-(2 * i - 1) * n) // (2 * K))  # ceil division
        return xs[r - 1]

    viol = tot = 0
    for i in range(1, K + 1):
        d = quantile(xb, i) - quantile(xa, i)
        tot += d * d
        if d > 0:
            viol += d * d
    got = QUERIES["model_almost_stochastic_order"](spark, SF).collect()[0]
    assert got["n_grid"] == K
    assert got["violation_sq_sum"] == viol
    assert got["total_sq_sum"] == tot
    assert got["eps_aso"] == round(viol / tot, 6) if tot else 0.5
    assert got["weekend_almost_dominates"] == (2 * viol < tot if tot else False)
    # epsilon is a ratio of a part to the whole
    assert 0.0 <= got["eps_aso"] <= 1.0


def test_canary_exposure_set_replay(spark):
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    S = 8

    def spans(text):
        t = text.split(" ")
        return {" ".join(t[i : i + S]) for i in range(len(t) - S + 1)}

    canaries = {r["doc_id"]: spans(r["text"]) for r in docs if r["doc_id"] % 101 == 7 and len(r["text"].split(" ")) >= S}
    corpus = {r["doc_id"]: spans(r["text"]) for r in docs if r["doc_id"] % 101 != 7 and len(r["text"].split(" ")) >= S}
    got = {r["canary_id"]: r for r in QUERIES["pipeline_canary_exposure"](spark, SF).collect()}
    assert set(got) == set(canaries)
    for cid, csp in canaries.items():
        leaking = [d for d, sp in corpus.items() if sp & csp]
        leaked = set().union(*[sp & csp for sp in corpus.values()]) if leaking else set()
        row = got[cid]
        assert row["n_leaking_docs"] == len(leaking)
        assert row["n_leaked_spans"] == len(leaked)
        assert row["exposed"] == (len(leaking) > 0)
