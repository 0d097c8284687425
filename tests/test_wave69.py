"""Wave-69 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_pinball_loss_properties(spark):
    rows = {r.quantile: r for r in QUERIES["events_pinball_loss"](spark, SF_SMALL).collect()}
    assert set(rows) == {0.5, 0.9}
    for r in rows.values():
        assert r.pinball_loss >= 0
        assert r.n_days == rows[0.5].n_days  # same scored window
    # q=0.5 pinball is half of MAE — both bounded by max daily count
    daily_max = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert rows[0.5].pinball_loss < daily_max


def test_haar_energy_conserves_total(spark):
    """Parseval for the orthonormal-by-halving Haar cascade: the input
    sum of squares equals sum over levels of 2^level * energy(level)
    (this normalization halves coefficients per level, scaling energy
    by 1/2 per step)."""
    rows = {r.level: r for r in QUERIES["events_haar_energy"](spark, SF_SMALL).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[1].n_coeffs == 8 and rows[2].n_coeffs == 4
    assert rows[3].n_coeffs == 2 and rows[0].n_coeffs == 2
    daily = (
        table(spark, SF_SMALL, "events")
        .where(F.col("ts").cast("date") < F.lit("2024-01-17").cast("date"))
        .groupBy(F.col("ts").cast("date"))
        .count()
        .collect()
    )
    total_sq = sum(r["count"] ** 2 for r in daily)
    recon = (
        2 * rows[1].energy
        + 4 * rows[2].energy
        + 8 * rows[3].energy
        + 8 * rows[0].energy
    )
    assert abs(total_sq - recon) < 1e-6 * max(total_sq, 1)
