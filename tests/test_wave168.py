"""Wave-168: islands vs python runs; Nelson-Aalen monotonicity + bounds;
k-fold determinism and stratification."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_islands_match_python_runs(spark):
    got = {r["user_id"]: r for r in QUERIES["events_gaps_islands"](spark, SF).collect()}
    rows = (
        table(spark, SF, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .collect()
    )
    by_user = defaultdict(set)
    for r in rows:
        by_user[r["user_id"]].add(r["d"])
    for uid, days in by_user.items():
        ds = sorted(days)
        runs, cur = [], [ds[0]]
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur.append(b)
            else:
                runs.append(cur)
                cur = [b]
        runs.append(cur)
        g = got[uid]
        assert g["n_islands"] == len(runs)
        assert g["longest_streak"] == max(len(r) for r in runs)
        assert g["active_days"] == len(ds)
        assert g["first_island_start"] == str(ds[0])


def test_nelson_aalen_monotone_and_bounded(spark):
    rows = sorted(
        QUERIES["model_nelson_aalen"](spark, SF).collect(), key=lambda r: r["t"]
    )
    assert rows
    prev = 0.0
    for r in rows:
        assert r["d_t"] >= 1
        assert r["n_t"] >= r["d_t"]
        assert r["cum_hazard"] >= prev  # cumulative hazard never decreases
        prev = r["cum_hazard"]
        # each increment is d/n <= 1 per step
    assert rows[-1]["cum_hazard"] <= len(rows) * 1.0


def test_kfold_deterministic_and_stratified(spark):
    a = QUERIES["pipeline_stratified_kfold"](spark, SF).collect()
    b = QUERIES["pipeline_stratified_kfold"](spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # rerun-identical
    folds = {r["fold"] for r in a}
    assert folds <= {0, 1, 2, 3, 4}
    for r in a:
        assert abs(r["fold_share"] - r["n"] / sum(
            x["n"] for x in a if x["lang"] == r["lang"]
        )) < 1e-6
