"""Wave-140: Bradley-Terry invariants, edit-distance reference."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_bradley_terry_matches_python(spark):
    rows = {r["event_type"]: r for r in QUERIES["model_bradley_terry"](spark, SF).collect()}
    per = defaultdict(dict)
    for r in (
        table(spark, SF, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .collect()
    ):
        per[r["day"]][r["event_type"]] = r["x"]
    wins = defaultdict(int)
    dec = defaultdict(int)
    for day, d in per.items():
        for i in d:
            for j in d:
                if i != j and d[i] != d[j]:
                    dec[i] += 1
                    if d[i] > d[j]:
                        wins[i] += 1
    raw = {t: wins[t] / (dec[t] / 2.0) for t in rows}
    s = sum(raw.values())
    total = 0.0
    for t, r in rows.items():
        assert r["total_wins"] == wins[t]
        assert r["total_decided"] == dec[t]
        assert abs(r["bt_strength"] - raw[t] / s) < 1e-5
        total += r["bt_strength"]
    assert abs(total - 1.0) < 1e-4  # strengths normalize


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python(spark):
    rows = QUERIES["fn_edit_distance"](spark, SF).collect()
    assert rows
    names = {r["c_custkey"]: r["c_name"] for r in table(spark, SF, "customer").collect()}
    for r in rows[:40]:
        d = _lev(names[r["k1"]], names[r["k2"]])
        assert r["edit_distance"] == d
        assert 0.0 <= r["similarity"] <= 1.0
