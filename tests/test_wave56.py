"""Wave-56 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_zone_map_report_accounts_every_row(spark):
    rows = QUERIES["maintenance_zone_map_report"](spark, SF_SMALL).collect()
    li = table(spark, SF_SMALL, "lineitem")
    assert sum(r.n_rows for r in rows) == li.count()
    for r in rows:
        assert r.min_ship.startswith(str(r.yr))
        assert r.max_ship.startswith(str(r.yr))
        assert r.skipped_by_pred == (r.max_ship < "1999-01-01")
    # the predicate must actually skip something and scan something
    assert any(r.skipped_by_pred for r in rows)
    assert any(not r.skipped_by_pred for r in rows)


def test_refresh_diff_matches_direct_counts(spark):
    rows = {r.o_orderstatus: r for r in QUERIES["warehouse_refresh_diff"](spark, SF_SMALL).collect()}
    o = table(spark, SF_SMALL, "orders")
    for status, r in rows.items():
        ins = o.where(
            (F.col("o_orderstatus") == status) & (F.col("o_orderkey") % 13 == 0)
        ).count()
        dels = o.where(
            (F.col("o_orderstatus") == status) & (F.col("o_orderkey") % 17 == 0)
        ).count()
        assert r.delta_n == ins - dels
        assert r.n_after == r.n_before + r.delta_n


def test_image_histogram_covers_every_pixel(spark):
    rows = QUERIES["mm_image_histogram"](spark, SF_SMALL).collect()
    per_doc = {}
    for r in rows:
        assert 0 <= r.bin < 16
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_px
    for doc_id, total in per_doc.items():
        w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
        assert total == w * h


def test_power_analysis_scales_with_variance(spark):
    rows = QUERIES["events_power_analysis"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_per_arm > 0 and r.days_needed >= 1
        assert r.mean_value > 0
        # detecting 5% of a mean ~= sd requires thousands per arm
        assert r.n_per_arm > 100
