"""Wave-120 semantic checks."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_ndcg_matches_numpy_bruteforce(spark):
    rows = {r.qid: r for r in QUERIES["model_ndcg_retrieval"](spark, SF_SMALL).collect()}
    pdf = table(spark, SF_SMALL, "embeddings").toPandas()
    E = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    labels = pdf["label"].to_numpy()
    ids = pdf["vec_id"].to_numpy()
    nrm = np.sqrt((E * E).sum(axis=1))
    w = [round(1_000_000 / math.log2(p + 1)) for p in range(1, 11)]
    cum = np.cumsum(w)
    for qpos in np.where(ids < 20)[0]:
        cos = (E @ E[qpos]) / (nrm * nrm[qpos])
        order = sorted(
            (
                (round(cos[i], 6), ids[i])
                for i in range(len(ids))
                if ids[i] != ids[qpos]
            ),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        rel = [1 if labels[list(ids).index(nid)] == labels[qpos] else 0 for _, nid in order]
        dcg = sum(r * w[p] for p, r in enumerate(rel))
        k = sum(rel)
        r = rows[ids[qpos]]
        assert r.n_rel == k
        assert r.dcg_w == dcg
        if k:
            assert r.idcg_w == cum[k - 1]
            assert abs(r.ndcg_10 - round(dcg / cum[k - 1], 6)) < 2e-6
            assert 0 < r.ndcg_10 <= 1
        else:
            assert r.idcg_w == 0 and r.ndcg_10 is None


def test_bridge_allocation_conserves_header_revenue(spark):
    rows = QUERIES["warehouse_bridge_allocation"](spark, SF_SMALL).collect()
    o = table(spark, SF_SMALL, "orders")
    li = table(spark, SF_SMALL, "lineitem")
    # only orders that HAVE lineitems contribute
    header_cents = (
        o.join(li.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")))
        .first()[0]
    )
    allocated = round(sum(r.allocated_header_revenue for r in rows) * 100)
    n_lines = sum(r.n_lines for r in rows)
    # floor allocation loses at most one cent per line, never over-allocates
    assert allocated <= header_cents
    assert header_cents - allocated <= n_lines
    assert abs(sum(r.brand_share for r in rows) - 1.0) < 1e-3
    assert n_lines == li.count()


def test_hist_equalize_flattens_and_preserves_support(spark):
    rows = QUERIES["mm_hist_equalize"](spark, SF_SMALL).collect()
    assert len(rows) == 200
    for r in rows:
        n = r.width * r.height
        # LUT is monotone: post levels can merge but never split
        assert 1 <= r.n_levels_post <= r.n_levels_pre <= 256
        assert 0 <= r.post_min <= r.post_max <= 255
        # equalized max is driven by cdf(255-ish) ~ n -> near 255
        assert r.post_max >= 255 - 256 // min(n, 256) - 1
        assert 0 <= r.post_sum <= 255 * n
    # cross-check one image end-to-end against the analytic pixel formula
    r0 = next(r for r in rows if r.doc_id == 7)
    w, h = 16 + 7 % 16, 16 + (7 * 3) % 16
    vals = [(x * 7 + y * 13 + 7) % 256 for y in range(h) for x in range(w)]
    hist = np.bincount(np.array(vals), minlength=256)
    cdf = np.cumsum(hist)
    lut = (255 * cdf) // (w * h)
    eq = lut[np.array(vals)]
    assert (r0.width, r0.height) == (w, h)
    assert r0.pre_sum == sum(vals)
    assert r0.post_sum == int(eq.sum())
    assert r0.n_levels_post == len(np.unique(eq))
