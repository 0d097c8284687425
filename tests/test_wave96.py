"""Wave-96 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_interpolation_reconstructs_and_bounds(spark):
    rows = QUERIES["win_linear_interpolate"](spark, SF_SMALL).collect()
    raw = {
        r.event_id: r.value
        for r in table(spark, SF_SMALL, "events")
        .where(F.col("user_id") < 50)
        .collect()
    }
    assert len(rows) == len(raw)
    interpolated = [r for r in rows if r.was_interpolated]
    assert interpolated, "mask must null some readings"
    for r in rows:
        if not r.was_interpolated:
            # untouched values pass through exactly (up to display rounding)
            assert abs(r.v_filled - raw[r.event_id]) < 1e-6
        else:
            assert r.event_id % 7 == 0
            assert r.v_filled is not None


def test_interpolation_between_neighbors(spark):
    rows = QUERIES["win_linear_interpolate"](spark, SF_SMALL).collect()
    # group per user in order; each interpolated value must lie within
    # [min, max] of its surrounding non-null values
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    checked = 0
    for rs in per_user.values():
        for i, r in enumerate(rs):
            if not r.was_interpolated:
                continue
            prevs = [x.v_filled for x in rs[:i] if not x.was_interpolated]
            nexts = [x.v_filled for x in rs[i + 1 :] if not x.was_interpolated]
            if prevs and nexts:
                lo, hi = min(prevs[-1], nexts[0]), max(prevs[-1], nexts[0])
                assert lo - 1e-6 <= r.v_filled <= hi + 1e-6
                checked += 1
    assert checked > 0


def test_mcnemar_cells_partition_data(spark):
    r = QUERIES["agg_mcnemar_test"](spark, SF_SMALL).first()
    n = table(spark, SF_SMALL, "lineitem").count()
    assert r.b + r.c + r.both_right + r.both_wrong == n
    expect = (abs(r.b - r.c) - 1) ** 2 / (r.b + r.c)
    assert abs(r.mcnemar_chi2 - expect) < 1e-5
    assert r.significant == (expect > 3.841459)


def test_mttr_mtbf_consistency(spark):
    r = QUERIES["events_mttr_mtbf"](spark, SF_SMALL).first()
    assert r.n_incidents >= 1
    assert r.total_downtime_s >= 60 * r.n_incidents  # each >= one minute
    assert abs(r.mttr_s - r.total_downtime_s / r.n_incidents) < 1e-3
    if r.n_incidents > 1:
        # MTBF (start-to-start) must exceed MTTR for non-overlapping incidents
        assert r.mtbf_s > 0
