"""Wave-150: cogroup merge vs python; grouped Arrow vs direct agg."""

from __future__ import annotations

import bisect
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cogroup_assist_counts_match_python(spark):
    rows = {r["user_id"]: r for r in QUERIES["udf_cogroup_pandas"](spark, SF).collect()}
    clicks = defaultdict(list)
    buys = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .select("user_id", "event_type", F.unix_millis("ts").alias("ms"))
        .collect()
    ):
        if r["event_type"] == "click":
            clicks[r["user_id"]].append(r["ms"])
        elif r["event_type"] == "purchase":
            buys[r["user_id"]].append(r["ms"])
    for u, bs in buys.items():
        cs = sorted(clicks.get(u, []))
        assisted = 0
        for b in bs:
            i = bisect.bisect_right(cs, b)
            if i > 0 and b - cs[i - 1] <= 3600000:
                assisted += 1
        assert rows[u]["n_purchases"] == len(bs)
        assert rows[u]["click_assisted"] == assisted
    # users with no purchases emit nothing
    assert set(rows) == set(buys)


def test_group_apply_in_arrow_matches_direct(spark):
    got = {
        r["event_type"]: (r["n"], r["v_milli"], r["max_milli"])
        for r in QUERIES["udf_group_apply_in_arrow"](spark, SF).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["v"], r["mx"])
        for r in (
            table(spark, SF, "events")
            .select("event_type", F.round(F.col("value") * 1000).cast("long").alias("m"))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("m").alias("v"),
                F.max("m").alias("mx"),
            )
            .collect()
        )
    }
    assert got == want
