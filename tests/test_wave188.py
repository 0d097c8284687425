"""Wave-188: Lilliefors vs an independent scipy-free Phi; Mood's median
cutoff semantics; turning-point count vs direct recompute."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily_counts(spark):
    rows = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    from collections import Counter

    per = Counter(r["d"] for r in rows)
    days = sorted(per)
    return days, np.array([per[d] for d in days], dtype=np.float64)


def test_lilliefors_matches_erf_phi(spark):
    row = QUERIES["agg_lilliefors_test"](spark, SF).collect()[0]
    _, x = _daily_counts(spark)
    n = len(x)
    z = np.sort((x - x.mean()) / x.std(ddof=1))
    phi = np.array([0.5 * (1 + math.erf(v / math.sqrt(2))) for v in z])
    i = np.arange(1, n + 1)
    d = max((i / n - phi).max(), (phi - (i - 1) / n).max())
    assert row["n_days"] == n
    # A&S 26.2.17 is good to 7.5e-8; 6dp rounding leaves <2e-6 slack
    assert abs(row["d_stat"] - d) < 2e-6, (row["d_stat"], d)
    assert row["reject_5pct"] == int(d > 0.886 / math.sqrt(n))


def test_mood_median_cutoff_and_chi2(spark):
    row = QUERIES["agg_mood_median_test"](spark, SF).collect()[0]
    rows = (
        table(spark, SF, "events")
        .selectExpr(
            "event_type", "CAST(FLOOR(value * 1000 + 0.5d) AS BIGINT) AS q"
        )
        .collect()
    )
    qs = np.array(sorted(r["q"] for r in rows))
    n = len(qs)
    cutoff = qs[(n - 1) // 2]  # lower median
    from collections import defaultdict

    ab = defaultdict(lambda: [0, 0])
    for r in rows:
        ab[r["event_type"]][0 if r["q"] > cutoff else 1] += 1
    ta = sum(v[0] for v in ab.values())
    tb = sum(v[1] for v in ab.values())
    chi2 = 0.0
    for g in sorted(ab):
        abv, blw = ab[g]
        ni = abv + blw
        ea, eb = ni * ta / n, ni * tb / n
        chi2 += (abv - ea) ** 2 / ea + (blw - eb) ** 2 / eb
    assert row["n_total"] == n and row["n_groups"] == len(ab)
    assert abs(row["chi2_stat"] - chi2) < 1e-5
    assert row["chi2_stat"] >= 0


def test_turning_points_match_direct(spark):
    row = QUERIES["events_turning_point_test"](spark, SF).collect()[0]
    rows = (
        table(spark, SF, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS d",
            "CAST(FLOOR(value * 1000 + 0.5d) AS BIGINT) AS q",
        )
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(int)
    for r in rows:
        per[r["d"]] += r["q"]
    x = np.array([per[d] for d in sorted(per)], dtype=np.int64)
    n = len(x)
    turns = int(((x[1:-1] - x[:-2]) * (x[2:] - x[1:-1]) < 0).sum())
    assert row["n_days"] == n
    assert row["n_turning"] == turns
    assert abs(row["expected"] - 2 * (n - 2) / 3) < 1e-6
    z = (turns - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    assert abs(row["z_stat"] - z) < 1e-5
