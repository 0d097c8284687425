"""Wave-136: readability reference, ABC class mass, newsvendor fractile
reference."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_flesch_matches_python(spark):
    rows = {r["doc_id"]: r for r in QUERIES["text_flesch_readability"](spark, SF).collect()}
    for r in table(spark, SF, "documents").collect()[:100]:
        w = len(r["text"].split(" "))
        s = len(re.findall(r"[aeiouy]+", r["text"]))
        expect = 206.835 - 1.015 * w - 84.6 * (s / w)
        got = rows[r["doc_id"]]
        assert (got["words"], got["syllables"]) == (w, s)
        assert abs(got["flesch_score"] - expect) < 1e-3


def test_abc_classes_cover_expected_mass(spark):
    rows = QUERIES["agg_abc_analysis"](spark, SF).collect()
    total = sum(r["cents"] for r in rows)
    mass = defaultdict(int)
    for r in rows:
        mass[r["abc_class"]] += r["cents"]
    assert set(mass) == {"A", "B", "C"}
    # class A holds <= 80% by construction, and adding the next customer
    # would cross 80 — so it lands within a customer's revenue of 80%
    assert mass["A"] <= 0.8 * total
    assert mass["A"] + mass["B"] <= 0.95 * total
    assert mass["A"] > 0.5 * total  # revenue concentration exists


def test_newsvendor_matches_python(spark):
    rows = {r["event_type"]: r for r in QUERIES["events_newsvendor_stock"](spark, SF).collect()}
    per = defaultdict(list)
    for r in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("d"))
        .collect()
    ):
        per[r["event_type"]].append((r["d"], r["day"]))
    for et, vals in per.items():
        vals.sort()
        n = len(vals)
        assert rows[et]["n_days"] == n
        assert rows[et]["stock_level"] == vals[math.ceil(0.9 * n) - 1][0]
        assert rows[et]["median_demand"] == vals[math.ceil(0.5 * n) - 1][0]
        assert rows[et]["stock_level"] >= rows[et]["median_demand"]
