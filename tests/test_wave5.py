"""Semantic invariants for the wave-5 additions (profiling, modeling,
collation). Oracle hash-parity is covered by tools/check_oracle.py; these
pin down one-pass plan shapes, interval algebra, and bit-reproducibility
properties a hash can't express.
"""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES


def test_profile_columns_scans_lineitem_once(spark, sf_small):
    from tests.test_scale_plans import plan

    p = plan(spark, "profile_columns", sf_small)
    # the AQE dump repeats the plan under "== Initial Plan ==" — count
    # scans in the executed (final) section only
    final = p.split("== Initial Plan ==")[0]
    # the oracle reads the table three times; the Spark plan must not
    assert final.count("Scan parquet") == 1
    assert "Expand" in final  # multi-count-distinct rewrite, not extra scans


def test_scd2_intervals_tile_the_timeline(spark, sf_small):
    rows = QUERIES["upsert_scd2_history"](spark, sf_small).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        currents = [r for r in rs if r.is_current]
        assert len(currents) == 1 and currents[-1] is rs[-1]
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from  # no gap, no overlap
        assert rs[-1].valid_to == "9999-12-31"


def test_ewma_matches_python_fir(spark, sf_small):
    rows = {
        (r.user_id, r.event_id): r.ewma
        for r in QUERIES["win_ewma"](spark, sf_small).collect()
    }
    events = sorted(
        table(spark, sf_small, "events")
        .select("user_id", "ts", "event_id", "value").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    hist: dict[int, list[float]] = {}
    for r in events:
        prev = hist.setdefault(r.user_id, [])
        expect = r.value
        for k in range(1, 8):
            tap = prev[-k] if len(prev) >= k else 0.0
            expect = expect + tap * (2.0 ** -k)
        assert rows[(r.user_id, r.event_id)] == expect, (r.user_id, r.event_id)
        prev.append(r.value)


def test_ewma_single_window_exchange(spark, sf_small):
    from tests.test_scale_plans import plan

    p = plan(spark, "win_ewma", sf_small).split("== Initial Plan ==")[0]
    # all 8 taps share one Window node and one shuffle on user_id
    assert p.count("Window") == 1
    assert p.count("Exchange") <= 2  # shuffle + (AQE) read, never 8


def test_approx_topk_equals_exact_groupby(spark, sf_small):
    import pyspark.sql.functions as F

    got = {
        (r.item, r.cnt)
        for r in QUERIES["agg_approx_topk"](spark, sf_small).collect()
    }
    exact = {
        (r.event_type, r.n)
        for r in table(spark, sf_small, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == exact


def test_metadata_counts_match_tables(spark, sf_small):
    got = {
        r.file_name: r.n_rows
        for r in QUERIES["scan_metadata_cols"](spark, sf_small).collect()
    }
    assert got == {
        "lineitem.parquet": table(spark, sf_small, "lineitem").count(),
        "orders.parquet": table(spark, sf_small, "orders").count(),
    }


def test_collation_matches_lower_fold(spark, sf_small):
    import pyspark.sql.functions as F

    got = {
        r.p_brand: (r.n_red_ci, r.n_not_promo_ci)
        for r in QUERIES["fn_collation"](spark, sf_small).collect()
    }
    expect = {
        r.p_brand: (r.red, r.np)
        for r in table(spark, sf_small, "part")
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.when(F.lower("p_name").contains("red"), 1).otherwise(0)
            ).alias("red"),
            F.sum(
                F.when(F.lower("p_type") == "promo", 0).otherwise(1)
            ).alias("np"),
        )
        .collect()
    }
    assert got == expect
