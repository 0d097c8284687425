"""Wave-141: catalog surface + rate source semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_managed_table_roundtrip(spark):
    rows = QUERIES["source_managed_table"](spark, SF).collect()
    src = table(spark, SF, "nation").count()
    assert len(rows) == src


def test_sql_udf_inlines_without_python_boundary(spark):
    df = QUERIES["fn_sql_udf_create"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows[:20]:
        assert r["charged"] >= r["disc_price"] >= 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a SQL UDF must inline: no python evaluation operators in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_global_temp_view_matches_direct_agg(spark):
    got = {
        r["event_type"]: (r["n"], r["users"])
        for r in QUERIES["source_global_temp_view"](spark, SF).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["users"])
        for r in table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("users"),
        )
        .collect()
    }
    assert got == want


def test_rate_source_generates_monotonic_rows(spark):
    rows = QUERIES["stream_rate_source_smoke"](spark, SF).collect()
    assert len(rows) > 0
    seqs = sorted(r["seq"] for r in rows)
    assert seqs == list(range(len(seqs)))  # gapless prefix of the sequence
    for r in rows[:50]:
        assert r["payload_mod"] == r["seq"] % 97
        assert r["n_chars"] == len(f"payload-{r['seq']}")
