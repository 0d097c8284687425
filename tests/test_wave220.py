"""Wave-220: paired t vs closed form; Nemenyi vs a python rank replay."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark):
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    return y


def test_paired_ttest_closed_form(spark):
    row = QUERIES["agg_paired_ttest"](spark, SF).collect()[0]
    y = _daily(spark)
    diffs = [y[d + 7] - y[d] for d in range(7) if d in y and d + 7 in y]
    n = len(diffs)
    mean = sum(diffs) / n
    sd = math.sqrt(
        (n * sum(d * d for d in diffs) - sum(diffs) ** 2) / (n * (n - 1))
    )
    assert row["n_pairs"] == n
    assert abs(row["mean_diff"] - mean) < 1e-6
    assert abs(row["sd_diff"] - sd) < 1e-4
    assert abs(row["t_stat"] - mean / (sd / math.sqrt(n))) < 1e-4


def test_nemenyi_replay(spark):
    rows = QUERIES["model_nemenyi_posthoc"](spark, SF).collect()
    ev = table(spark, SF, "events").select("ts").collect()
    cells = Counter()
    days = set()
    for r in ev:
        d = r["ts"].date()
        days.add(d)
        cells[(d, r["ts"].hour // 6)] += 1
    k, n = 4, len(days)
    sr2 = [0] * k
    for d in days:
        vals = [cells.get((d, b), 0) for b in range(k)]
        for b in range(k):
            below = sum(1 for v in vals if v < vals[b])
            eq = sum(1 for v in vals if v == vals[b])
            sr2[b] += 2 * below + eq + 1
    mean_rank = [s / (2.0 * n) for s in sr2]
    cd = 3.63316 / math.sqrt(2) * math.sqrt(k * (k + 1) / (6.0 * n))
    got = {(r["bin_i"], r["bin_j"]): r for r in rows}
    assert len(got) == 6
    for i in range(k):
        for j in range(i + 1, k):
            r = got[(i, j)]
            assert abs(r["mean_rank_i"] - mean_rank[i]) < 1e-6
            assert abs(r["mean_rank_j"] - mean_rank[j]) < 1e-6
            diff = abs(mean_rank[i] - mean_rank[j])
            assert abs(r["rank_diff"] - diff) < 1e-6
            assert abs(r["critical_diff"] - cd) < 1e-5
            assert r["significant"] == (diff > cd)
    # mean ranks over k treatments must average to (k+1)/2 exactly
    assert abs(sum(mean_rank) / k - (k + 1) / 2) < 1e-9
