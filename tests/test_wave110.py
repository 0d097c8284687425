"""Wave-110 semantic checks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_edge_orientation_partitions_interior(spark):
    rows = QUERIES["mm_image_edge_orientation"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows[:10]:
        w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 3) % 16
        interior = (w - 2) * (h - 2)
        total = (
            r.n_vertical_edges + r.n_horizontal_edges + r.n_diag_pos + r.n_diag_neg
        )
        # vertical & horizontal bins can overlap when 2|gx|>=5|gy| AND
        # 2|gy|>=5|gx| (only near gx=gy=0) — so total >= interior
        assert total >= interior
        # brute-force one image
        img = np.fromfunction(
            lambda y, x: (x * 7 + y * 13 + r.doc_id) % 256, (h, w), dtype=np.int64
        )
        tl = img[:-2, :-2]; tm = img[:-2, 1:-1]; tr = img[:-2, 2:]
        ml = img[1:-1, :-2]; mr = img[1:-1, 2:]
        bl = img[2:, :-2]; bm = img[2:, 1:-1]; br = img[2:, 2:]
        gx = (tr + 2 * mr + br) - (tl + 2 * ml + bl)
        gy = (bl + 2 * bm + br) - (tl + 2 * tm + tr)
        assert r.n_vertical_edges == int((2 * np.abs(gx) >= 5 * np.abs(gy)).sum())


def test_funnel_sweep_monotone(spark):
    rows = QUERIES["events_funnel_window_sweep"](spark, SF_SMALL).collect()
    assert [r.window_hours for r in rows] == [1, 6, 24, 72]
    # conversion can only grow with the window
    conv = [r.n_converted for r in rows]
    assert conv == sorted(conv)
    n_signups = rows[0].n_signups
    expected = (
        table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert n_signups == expected
    for r in rows:
        assert 0 <= r.conversion_rate <= 1


def test_median_ci_brackets_median(spark):
    r = QUERIES["agg_median_ci_orderstat"](spark, SF_SMALL).first()
    assert r.ci_lo <= r.median_value <= r.ci_hi
    vals = sorted(
        round(row.o_totalprice * 100)
        for row in table(spark, SF_SMALL, "orders").collect()
    )
    n = len(vals)
    assert r.n == n
    assert abs(r.median_value - vals[(n + 1) // 2 - 1] / 100) < 0.02
    # CI width shrinks like 1/sqrt(n): sanity gate
    assert r.ci_hi - r.ci_lo > 0
