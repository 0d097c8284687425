"""Wave-324: homogeneity suite vs python walks of the three screens;
Bartels RVN vs a rank replay."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _series(spark):
    days = Counter(
        r["d"]
        for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    )
    return [days[d] for d in sorted(days)]


def test_homogeneity_suite_matches_walks(spark):
    row = QUERIES["events_homogeneity_suite"](spark, SF).first()
    xs = _series(spark)
    n = len(xs)
    mu = sum(xs) / n
    sd = math.sqrt(sum((x - mu) ** 2 for x in xs) / n)
    sk = []
    run = 0.0
    for x in xs:
        run += x - mu
        sk.append(run)
    r_range = (max(sk) - min(sk)) / sd
    t_max = max(
        (i + 1) * ((sk[i] / (i + 1)) / sd) ** 2
        + (n - i - 1) * ((-sk[i] / (n - i - 1)) / sd) ** 2
        for i in range(n - 1)
    )
    d2 = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
    vn = d2 / (n * sd * sd)
    assert row["n_days"] == n
    assert abs(row["buishand_r_sqrtn"] - r_range / math.sqrt(n)) < 1e-4
    assert abs(row["snht_t_max"] - t_max) < 1e-3
    assert abs(row["von_neumann_ratio"] - vn) < 1e-4
    assert row["positively_dependent"] == (vn < 2)
    # the final cumulative deviation returns to ~0, so the range is
    # bounded below by |max(sk)| / sd
    assert abs(sk[-1]) < 1e-6 * max(1.0, abs(sk[0]))
    assert row["buishand_r_sqrtn"] > 0


def test_bartels_matches_rank_replay(spark):
    row = QUERIES["agg_bartels_rank"](spark, SF).first()
    xs = _series(spark)
    n = len(xs)
    order = sorted(range(n), key=lambda i: (xs[i], i))
    r = [0] * n
    for rank, i in enumerate(order, 1):
        r[i] = rank
    num = sum((r[i + 1] - r[i]) ** 2 for i in range(n - 1))
    rbar = (n + 1) / 2
    den = sum((ri - rbar) ** 2 for ri in r)
    rvn = num / den
    z = (rvn - 2) / math.sqrt(4 / n)
    assert row["n_days"] == n
    assert abs(row["bartels_rvn"] - rvn) < 1e-5
    assert abs(row["z_bartels"] - z) < 1e-4
    assert row["nonrandom"] == (abs(z) > 1.959964)
    # RVN is bounded in (0, 4) for any permutation
    assert 0 < row["bartels_rvn"] < 4
