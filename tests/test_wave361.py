"""Wave-361: knee detection vs a python chord-distance replay."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_knee_detection_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    tot = {}
    for r in rows:
        tot[r["user_id"]] = tot.get(r["user_id"], 0) + r["p"]
    curve = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))
    ys = [v for _, v in curve]
    n = len(ys)
    i1, i2, y1, y2 = 1, n, ys[0], ys[-1]
    dists = [
        abs((y2 - y1) * (i - i1) - (i2 - i1) * (ys[i - 1] - y1))
        for i in range(1, n + 1)
    ]
    dmax = max(dists)
    knee = min(i for i in range(1, n + 1) if dists[i - 1] == dmax)
    row = QUERIES["model_knee_detection"](spark, SF).first()
    assert row["n_points"] == n
    assert row["knee_rank"] == knee
    assert abs(row["knee_value"] - ys[knee - 1] / 100) < 1e-9
    assert abs(row["chord_distance_num"] - dmax) < 1e-6
    # endpoints can never be the knee (their chord distance is 0)
    assert 1 < row["knee_rank"] < n
