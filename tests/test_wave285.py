"""Wave-285: planner vs a byte-count replay (plus the invariant that
every plan keeps partitions at or under the 128 MiB target), Dixon Q vs
an order-statistic replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
TARGET = 128 * 1024 * 1024


def test_partition_planner_replay(spark):
    rows = {r.scale_multiplier: r for r in QUERIES["maintenance_partition_size_planner"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "event_type", "props"
    ).collect()
    n = len(ev)
    payload = sum(
        8 + 8 + 8 + len(r.event_type.encode()) + 8 + len(r.props.encode())
        for r in ev
    )
    for k in (1, 100, 1000):
        r = rows[k]
        parts = max(1, math.ceil(payload * k / TARGET))
        assert r.projected_rows == n * k
        assert r.projected_bytes == payload * k
        assert abs(r.avg_row_bytes - round(payload / n, 4)) < 1e-9
        assert r.recommended_partitions == parts
        assert r.rows_per_partition == math.ceil(
            n * k / math.ceil(payload * k / TARGET)
        )
        # the plan's whole point: partitions stay at or under target
        assert payload * k / parts <= TARGET + 1


def test_dixon_q_replay(spark):
    row = QUERIES["agg_dixon_q"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    ys = sorted(sum(v) / len(v) for _, v in sorted(per.items()))
    n = len(ys)
    rng = ys[-1] - ys[0]
    q_low = (ys[1] - ys[0]) / rng
    q_high = (ys[-1] - ys[-2]) / rng
    assert row.n_obs == n
    assert abs(row.q_low - round(q_low, 6)) < 1e-9
    assert abs(row.q_high - round(q_high, 6)) < 1e-9
    assert bool(row.outlier_flagged) == (max(q_low, q_high) > 0.29)
    assert abs(row.min_value - round(ys[0], 6)) < 1e-9
    assert abs(row.max_value - round(ys[-1], 6)) < 1e-9
    # Q ratios are proper fractions of the range
    assert 0 <= row.q_low <= 1 and 0 <= row.q_high <= 1
