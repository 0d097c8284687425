"""Wave-385 pytest: seasonal Sen slope replayed in pure Python."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_seasonal_sen_slope_matches_pure_python(spark):
    row = QUERIES["events_seasonal_sen_slope"](spark, SF).first()
    daily = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"), F.weekday("ts").alias("dow"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    seasons = defaultdict(list)
    for r in daily:
        seasons[r["dow"]].append((r["day"], r["c"]))
    slopes = []
    for series in seasons.values():
        series.sort()
        for i in range(len(series)):
            for j in range(i + 1, len(series)):
                dd = (series[j][0] - series[i][0]).days
                slopes.append((series[j][1] - series[i][1]) * 1.0 / dd)
    slopes.sort()
    n = len(slopes)
    assert row["n_pairs"] == n
    med = (
        slopes[n // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
    )
    assert abs(row["sen_slope_per_day"] - round(med, 6)) <= 1e-9
    assert abs(row["sen_slope_per_week"] - round(med * 7, 6)) <= 1e-9
