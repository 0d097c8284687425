"""Wave-187: Pettitt vs brute-force pairwise U; Bartlett vs numpy
variances; Jonckheere-Terpstra vs the naive O(N^2) pair count."""

from __future__ import annotations

import math

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily_milli(spark):
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
    days = sorted(per)
    return days, np.array([per[d] for d in days], dtype=np.int64)


def test_pettitt_matches_bruteforce_pairs(spark):
    row = QUERIES["events_pettitt_changepoint"](spark, SF).collect()[0]
    days, x = _daily_milli(spark)
    n = len(x)
    # naive U_t = sum_{i<=t} sum_{j>t} sgn(x_j - x_i)
    best_k, best_day = -1, None
    for t in range(1, n):
        ut = int(np.sign(x[t:][None, :] - x[:t][:, None]).sum())
        if abs(ut) > best_k:
            best_k, best_day = abs(ut), days[t - 1]
    assert row["n_days"] == n
    assert row["k_stat"] == best_k
    assert row["cp_day"] == str(best_day)
    p = 2 * math.exp(-6 * best_k**2 / (n**3 + n**2))
    assert abs(row["p_approx"] - p) < 1e-5


def test_bartlett_matches_numpy(spark):
    row = QUERIES["agg_bartlett_test"](spark, SF).collect()[0]
    rows = (
        table(spark, SF, "events")
        .selectExpr(
            "event_type", "CAST(FLOOR(value * 1000 + 0.5d) AS BIGINT) AS q"
        )
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["event_type"]].append(r["q"])
    ns = np.array([len(per[g]) for g in sorted(per)])
    vs = np.array(
        [np.var(np.array(per[g], dtype=np.float64), ddof=1) / 1e6 for g in sorted(per)]
    )
    N, k = ns.sum(), len(ns)
    sp2 = ((ns - 1) * vs).sum() / (N - k)
    stat = ((N - k) * math.log(sp2) - ((ns - 1) * np.log(vs)).sum()) / (
        1 + ((1 / (ns - 1)).sum() - 1 / (N - k)) / (3 * (k - 1))
    )
    assert row["n_total"] == N and row["n_groups"] == k
    assert abs(row["pooled_var"] - sp2) < 1e-4 * max(1.0, sp2)
    assert abs(row["bartlett_stat"] - stat) < 1e-4
    assert row["bartlett_stat"] >= 0


def test_jonckheere_matches_naive_pairs(spark):
    row = QUERIES["agg_jonckheere_terpstra"](spark, SF).collect()[0]
    rows = (
        table(spark, SF, "events")
        .selectExpr(
            "CAST(FLOOR(hour(ts) / 6) AS BIGINT) AS g",
            "CAST(FLOOR(value * 10 + 0.5d) AS BIGINT) AS b",
        )
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["g"]].append(r["b"])
    groups = sorted(per)
    jt2 = 0
    for i, a in enumerate(groups):
        xa = np.array(per[a])
        for b in groups[i + 1 :]:
            xb = np.array(per[b])
            less = (xa[:, None] < xb[None, :]).sum()
            ties = (xa[:, None] == xb[None, :]).sum()
            jt2 += 2 * int(less) + int(ties)
    n = sum(len(v) for v in per.values())
    assert row["n_total"] == n
    assert row["jt_twice"] == jt2
    # mean sanity: JT/2 should be within a few sd of mean for null-ish data
    assert abs(row["z_stat"]) < 10
