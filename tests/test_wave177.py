"""Wave-177: every declared PK is actually unique and non-null in the
fixtures; counts cross-check against direct queries."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_uniqueness_audit_covers_all_tables_and_passes(spark):
    rows = {r["table_name"]: r for r in QUERIES["dq_uniqueness_audit"](spark, SF).collect()}
    assert set(rows) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name, r in rows.items():
        assert r["n_null_keys"] == 0, name
        assert r["n_rows"] == table(spark, SF, name).count(), name
        if name == "lineitem":
            # the synthetic fixture does NOT enforce TPC-H's composite
            # (orderkey, linenumber) key — the audit must CATCH that
            assert r["is_unique"] is False
            assert r["n_distinct_keys"] < r["n_rows"]
        else:
            assert r["is_unique"] is True, name
            assert r["n_rows"] == r["n_distinct_keys"], name
