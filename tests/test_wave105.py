"""Wave-105 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_kruskal_wallis_matches_scipy_formula(spark):
    r = QUERIES["agg_kruskal_wallis"](spark, SF_SMALL).first()
    pdf = (
        table(spark, SF_SMALL, "orders")
        .select("o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .toPandas()
    )
    ranks = pdf["c"].rank(method="average")
    n = len(pdf)
    h = 0.0
    for _, g in pdf.assign(rk=ranks).groupby("o_orderpriority"):
        h += g["rk"].sum() ** 2 / len(g)
    h = 12 / (n * (n + 1)) * h - 3 * (n + 1)
    _, t = np.unique(pdf["c"], return_counts=True)
    c = 1 - ((t ** 3 - t).sum()) / (n ** 3 - n)
    assert r.n == n
    assert abs(r.h_uncorrected - h) < 1e-3
    assert abs(r.tie_correction - c) < 1e-6
    assert abs(r.h_statistic - h / c) < 1e-3
    assert r.reject_equal_medians == (h / c > 9.487729)


def test_quadtree_counts_consistent(spark):
    rows = QUERIES["mm_image_quadtree"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.level1_nodes == 4
        assert 0 <= r.level1_splits <= 4
        assert r.level2_nodes == 4 * r.level1_splits
        assert r.n_leaves == (4 - r.level1_splits) + r.level2_nodes
    # brute-force one image
    r0 = rows[0]
    w, h = 16 + r0.doc_id % 16, 16 + (r0.doc_id * 3) % 16
    img = np.fromfunction(
        lambda y, x: (x * 7 + y * 13 + r0.doc_id) % 256, (h, w), dtype=np.int64
    )
    splits = 0
    for (y0, y1) in [(0, h // 2), (h // 2, h)]:
        for (x0, x1) in [(0, w // 2), (w // 2, w)]:
            reg = img[y0:y1, x0:x1]
            n, s, ss = reg.size, reg.sum(), (reg * reg).sum()
            if n * ss - s * s > 400 * n * n:
                splits += 1
    assert r0.level1_splits == splits


def test_pseudonym_audit_clean(spark):
    r = QUERIES["privacy_pseudonym_audit"](spark, SF_SMALL).first()
    # at fixture scales a 48-bit prefix cannot collide
    assert r.n_collisions == 0
    assert r.n_pseudonyms == r.n_users
    assert r.consistent
