"""Wave-221: Tukey-Kramer HSD vs a python recompute, plus the
ANOVA-consistency property."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_tukey_hsd_recompute(spark):
    rows = {(r["group_i"], r["group_j"]): r for r in QUERIES["agg_tukey_hsd"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(int(math.floor(r["value"] * 100 + 0.5)))
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    ssw = sum(
        (len(v) * sum(y * y for y in v) - sum(v) ** 2) / len(v)
        for v in groups.values()
    )
    mse = ssw / (nn - k)
    names = sorted(groups)
    assert len(rows) == k * (k - 1) // 2
    n_sig = 0
    for i in range(k):
        for j in range(i + 1, k):
            gi, gj = names[i], names[j]
            r = rows[(gi, gj)]
            mi = sum(groups[gi]) / len(groups[gi])
            mj = sum(groups[gj]) / len(groups[gj])
            assert abs(r["mean_i"] - mi / 100) < 1e-6
            assert abs(r["mean_j"] - mj / 100) < 1e-6
            diff = abs(mi - mj)
            cd = 3.858 * math.sqrt(
                mse / 2 * (1 / len(groups[gi]) + 1 / len(groups[gj]))
            )
            assert abs(r["abs_diff"] - diff / 100) < 1e-5
            assert abs(r["critical_diff"] - cd / 100) < 1e-5
            assert r["significant"] == (diff > cd)
            n_sig += r["significant"]
    # the fixture's value distribution is type-independent: HSD should
    # declare few (if any) pairs different — never all of them
    assert n_sig < k * (k - 1) // 2
