"""Wave-93 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_ar2_matches_numpy_yule_walker(spark):
    r = QUERIES["model_ar2_yule_walker"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .collect()
    )
    x = np.array([row.x for row in daily], dtype=float)
    dev = x - x.mean()
    c0 = (dev * dev).sum()
    r1 = (dev[1:] * dev[:-1]).sum() / c0
    r2 = (dev[2:] * dev[:-2]).sum() / c0
    assert abs(r.acf1 - r1) < 1e-5
    assert abs(r.acf2 - r2) < 1e-5
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert abs(r.phi1 - phi1) < 1e-5
    assert abs(r.phi2 - phi2) < 1e-5
    forecast = x.mean() + phi1 * dev[-1] + phi2 * dev[-2]
    assert abs(r.forecast_next - forecast) < 1e-2


def test_chinchilla_scaling_identities(spark):
    rows = QUERIES["pipeline_chinchilla_budget"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        # D = 20 N at the optimum, and 6 N D ≈ C
        assert abs(r.d_tokens_opt - 20 * r.n_params_opt) < 25
        assert abs(6 * r.n_params_opt * r.d_tokens_opt - r.flops) / r.flops < 1e-3
        assert r.single_epoch_feasible == (r.d_tokens_opt <= r.corpus_tokens)
    # larger budgets need more tokens
    d = [r.d_tokens_opt for r in rows]
    assert d == sorted(d)


def test_otsu_matches_bruteforce(spark):
    rows = QUERIES["mm_image_otsu"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows[:15]:
        w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 3) % 16
        img = np.fromfunction(
            lambda y, x: (x * 7 + y * 13 + r.doc_id) % 256, (h, w), dtype=np.int64
        ).ravel()
        nt, st = len(img), img.sum()
        best_t, best_v = None, -1.0
        for t in range(256):
            n0 = (img <= t).sum()
            if n0 == 0 or n0 == nt:
                continue
            s0 = img[img <= t].sum()
            v = float(st * n0 - nt * s0) ** 2 / (n0 * (nt - n0))
            if v > best_v:
                best_v, best_t = v, t
        assert r.threshold == best_t
        assert 0 < r.fg_fraction < 1
        assert r.between_var > 0
