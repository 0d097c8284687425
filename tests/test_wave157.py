"""Wave-157: border function vs python; Z-order tile spans exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_border_matches_python(spark):
    rows = {r["doc_id"]: r for r in QUERIES["text_border_periodicity"](spark, SF).collect()}
    for d in table(spark, SF, "documents").collect():
        if d["doc_id"] >= 200:
            continue
        toks = d["text"].split(" ")
        n = len(toks)
        border = 0
        for k in range(1, n):
            if toks[:k] == toks[n - k :]:
                border = k
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == n
        assert r["max_border"] == border
        assert r["period"] == n - border
        assert r["is_periodic"] == (2 * border >= n)


def test_zorder_tile_spans_exact(spark):
    r = QUERIES["scan_zorder_locality_audit"](spark, SF).collect()[0]
    assert r["n_tiles"] == 16
    # aligned 4x4 Morton tiles are perfectly contiguous: span 16 each
    assert r["morton_span_sum"] == 16 * 16
    # row-major 4x4 tile spans 3*16+3+1 = 52 each
    assert r["rowmajor_span_sum"] == 16 * 52
    assert abs(r["locality_gain"] - 52 / 16) < 1e-6
