"""Wave-65 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_backfill_cutover_reconciles_and_splits_at_cut(spark):
    rows = QUERIES["stream_backfill_cutover"](spark, SF_SMALL).collect()
    n_events = table(spark, SF_SMALL, "events").count()
    assert sum(r.n for r in rows) == n_events  # seam neither drops nor doubles
    for r in rows:
        if r.d < "2024-01-21":
            assert r.n_from_stream == 0 and r.n_from_backfill == r.n
        else:
            assert r.n_from_backfill == 0 and r.n_from_stream == r.n


def test_referential_integrity_fixture_has_no_orphans(spark):
    rows = {r.fk_edge: r for r in QUERIES["dq_referential_integrity"](spark, SF_SMALL).collect()}
    assert len(rows) == 6
    for edge, r in rows.items():
        assert r.n_orphans == 0, edge  # driver fixtures are FK-consistent
        assert 0 <= r.n_childless <= r.n_parents


def test_retention_decay_fit_matches_independent_ols(spark):
    """sf0.001 retention is ~flat (15 users active all month), so assert
    the FIT, not a decay sign: the closed-form slope must match numpy's
    polyfit on independently recomputed rates."""
    import math

    import numpy as np

    r = QUERIES["events_retention_decay_fit"](spark, SF_SMALL).first()
    assert r.n_points == 14
    e = table(spark, SF_SMALL, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first = {
        x.user_id: x.d0
        for x in e.groupBy("user_id").agg(F.min("d").alias("d0")).collect()
    }
    active = {(x.user_id, x.d) for x in e.distinct().collect()}
    n0 = len(first)
    ks, lrs = [], []
    for k in range(1, 15):
        n_k = len({u for (u, d) in active if (d - first[u]).days == k})
        ks.append(k)
        lrs.append(math.log(n_k / n0))
    slope = np.polyfit(ks, lrs, 1)[0]
    assert abs(r.decay_slope - slope) < 1e-4
    assert abs(r.half_life_days - (-math.log(2) / slope)) < 0.51


def test_role_playing_matrix_reconciles(spark):
    rows = QUERIES["join_role_playing_dates"](spark, SF_SMALL).collect()
    li = table(spark, SF_SMALL, "lineitem")
    assert sum(r.n for r in rows) == li.count()
    # the fixture's synthetic dates are uncorrelated: both directions of
    # year spill (and negative lags) must surface rather than be hidden
    assert any(r.ship_year != r.order_year for r in rows)
    cell = rows[0]
    o = table(spark, SF_SMALL, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).where(
        (F.year("o_orderdate") == cell.order_year)
        & (F.year("l_shipdate") == cell.ship_year)
    )
    direct = j.agg(
        F.round(
            F.sum(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            * 1.0
            / F.count("*"),
            4,
        ).alias("lag")
    ).first()
    assert abs(direct.lag - cell.avg_lag_days) < 1e-9
