"""Wave-176: S-curve math vs python; threshold sweep monotonicity;
schema evolution union semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_s_curve_matches_python_and_is_monotone(spark):
    rows = QUERIES["pipeline_lsh_tuning_curve"](spark, SF).collect()
    assert len(rows) == 36
    for r in rows:
        p = 1 - (1 - r["jaccard"] ** r["rows_per_band"]) ** r["bands"]
        assert abs(r["p_detect"] - p) < 1e-6
        assert abs(
            r["threshold_50ish"] - (1 / r["bands"]) ** (1 / r["rows_per_band"])
        ) < 1e-6
    # monotone in s within each config
    from collections import defaultdict

    by_cfg = defaultdict(list)
    for r in rows:
        by_cfg[(r["bands"], r["rows_per_band"])].append((r["jaccard"], r["p_detect"]))
    for pts in by_cfg.values():
        pts.sort()
        assert all(a[1] <= b[1] + 1e-12 for a, b in zip(pts, pts[1:]))


def test_threshold_sweep_monotone_decreasing(spark):
    rows = sorted(
        QUERIES["pipeline_dedup_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [0.7, 0.8, 0.9, 0.95]
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]  # higher bar, fewer pairs
        assert a["n_docs_removable"] >= b["n_docs_removable"]
    assert rows[0]["n_pairs"] > 0  # the fixture plants near-dups


def test_schema_evolution_null_fills_v1(spark):
    rows = {r["n_nationkey"]: r for r in QUERIES["source_schema_evolution"](spark, SF).collect()}
    src = {
        r["n_nationkey"]: r
        for r in table(spark, SF, "nation").collect()
    }
    assert set(rows) == set(src)
    for k, r in rows.items():
        assert r["n_name"] == src[k]["n_name"]
        if k % 2 == 0:
            assert r["from_v2"] is True
            assert r["n_regionkey"] == src[k]["n_regionkey"]
        else:
            assert r["from_v2"] is False
            assert r["n_regionkey"] is None  # v1 files lack the column
