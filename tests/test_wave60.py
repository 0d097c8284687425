"""Wave-60 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_recursive_cte_spine_complete(spark):
    rows = QUERIES["sql_recursive_cte"](spark, SF_SMALL).collect()
    assert len(rows) == 84  # 7 full years of months, data or not
    months = {(r.yr, r.mth) for r in rows}
    assert (1995, 1) in months and (2001, 12) in months
    # gap months carry zero revenue; non-gaps carry positive cents
    for r in rows:
        assert (r.cents == 0) if r.is_gap else (r.cents > 0)
    # the fixture ships nothing after 2001-11
    assert any(r.is_gap for r in rows)


def test_pipe_syntax_matches_dsl(spark):
    got = {
        r.o_orderpriority: (r.n_urgentish, r.cents)
        for r in QUERIES["sql_pipe_syntax"](spark, SF_SMALL).collect()
    }
    o = table(spark, SF_SMALL, "orders")
    want = {
        r.o_orderpriority: (r.n, r.cents)
        for r in o.where(
            (F.col("o_orderstatus") == "O")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_dp_noise_is_laplace_shaped(spark):
    rows = QUERIES["privacy_dp_laplace_hashnoise"](spark, SF_SMALL).collect()
    assert len(rows) == 25
    for r in rows:
        assert abs(r.n_noised - r.noise - round(r.n_noised - r.noise)) < 1e-3
        # b=2 Laplace: |noise| beyond 8b is ~e^-8 — absent on 25 draws
        assert abs(r.noise) < 16
    # noise must actually perturb (not all zeros) and be signed both ways
    assert any(r.noise > 0.01 for r in rows)
    assert any(r.noise < -0.01 for r in rows)
