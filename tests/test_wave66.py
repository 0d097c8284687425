"""Wave-66 semantic checks."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    rows = QUERIES["agg_empirical_bayes_rates"](spark, SF_SMALL).collect()
    assert rows
    prior_mean = 2 / 10
    for r in rows:
        # shrunk rate sits strictly between raw rate and the prior mean
        lo, hi = sorted((r.raw_rate, prior_mean))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9
        # shrinkage decays with evidence: big n moves less than pseudo-n
        if r.n >= 100:
            assert r.shrink_amount < abs(r.raw_rate - prior_mean) * 0.2 + 1e-9


def test_embedding_drift_halves_agree_on_fixture(spark):
    rows = QUERIES["sim_embedding_drift"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert -1 <= r.centroid_cosine <= 1
        assert r.centroid_l2 >= 0
        assert r.drifted == (r.centroid_cosine < 0.99)


def test_peaks_top_their_neighborhoods(spark):
    import pyspark.sql.functions as F

    from data_ingestor_web_app_spark.io import table

    peaks = QUERIES["events_peak_prominence"](spark, SF_SMALL).collect()
    daily = {
        str(r.d): r.y
        for r in table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("y"))
        .collect()
    }
    import datetime as dt

    for p in peaks:
        assert p.prominence > 0
        d = dt.date.fromisoformat(p.d)
        for off in (-3, -2, -1, 1, 2, 3):
            nd = str(d + dt.timedelta(days=off))
            if nd in daily:
                assert daily[nd] < p.y, (p, nd)


def test_uncertainty_sample_is_the_closest_to_half(spark):
    rows = QUERIES["pipeline_uncertainty_sample"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    margins = [r.uncertainty_margin for r in rows]
    assert margins == sorted(margins)
    assert all(abs(r.conf - 0.5) - r.uncertainty_margin < 1e-5 for r in rows)
