"""Wave-172: ABC-XYZ partition properties; SCD3 transition semantics;
PVM bridge exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_abc_xyz_partitions_everything_once(spark):
    rows = QUERIES["inventory_abc_xyz"](spark, SF).collect()
    assert rows
    cells = {(r["abc"], r["xyz"]) for r in rows}
    assert all(a in "ABC" and x in "XYZ" for a, x in cells)
    n_parts = sum(r["n_parts"] for r in rows)
    expected = (
        table(spark, SF, "lineitem")
        .groupBy("l_partkey")
        .count()
        .where(F.col("count") >= 2)
        .count()
    )
    assert n_parts == expected
    # A cells must carry more revenue per part than C cells on average
    rev = {(r["abc"], r["xyz"]): (r["revenue"], r["n_parts"]) for r in rows}
    a_rev = sum(v for (a, _), (v, n) in rev.items() if a == "A")
    a_n = sum(n for (a, _), (v, n) in rev.items() if a == "A")
    c_rev = sum(v for (a, _), (v, n) in rev.items() if a == "C")
    c_n = sum(n for (a, _), (v, n) in rev.items() if a == "C")
    if a_n and c_n:
        assert a_rev / a_n > c_rev / c_n


def test_scd3_transition_semantics(spark):
    rows = {r["custkey"]: r for r in QUERIES["upsert_scd3_previous"](spark, SF).collect()}
    o = table(spark, SF, "orders").select(
        "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    ).collect()
    from collections import defaultdict

    hist = defaultdict(list)
    for r in o:
        hist[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"], r["o_orderstatus"]))
    for ck, h in hist.items():
        h.sort(reverse=True)
        r = rows[ck]
        assert r["current_status"] == h[0][2]
        if len(h) >= 2:
            assert r["previous_status"] == h[1][2]
            assert r["status_changed"] == (h[0][2] != h[1][2])
        else:
            assert r["previous_status"] is None
            assert r["status_changed"] is True  # changed-from-nothing
        assert r["effective_date"] == str(h[0][0])


def test_pvm_bridge_is_exact(spark):
    r = QUERIES["warehouse_price_volume_mix"](spark, SF).collect()[0]
    delta = r["revenue_curr"] - r["revenue_base"]
    parts = r["price_effect"] + r["volume_effect"] + r["mix_effect"]
    assert abs(delta - parts) < 0.05  # cents-level closure
    assert abs(r["bridge_residual"]) < 0.05
    assert r["n_parts"] > 0
