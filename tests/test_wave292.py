"""Wave-292: Nigrini MAD vs a digit replay, CAP AR vs a sorted
Mann-Whitney replay plus the AR = 2*AUC - 1 identity against a direct
pairwise AUC."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_benford_mad_replay(spark):
    row = QUERIES["model_benford_mad"](spark, SF).collect()[0]
    vals = [
        r.o_totalprice
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
        if r.o_totalprice > 0
    ]
    cnt = Counter(int(str(round(v * 100))[0]) for v in vals)
    t = sum(cnt.values())
    mad = sum(
        abs(cnt.get(d, 0) / t - math.log10(1 + 1 / d)) for d in range(1, 10)
    ) / 9
    assert row.n_values == t
    assert abs(row.mad - round(mad, 6)) < 1e-9
    expect = (
        "close"
        if mad <= 0.006
        else "acceptable"
        if mad <= 0.012
        else "marginal"
        if mad <= 0.015
        else "nonconforming"
    )
    assert row.nigrini_verdict == expect


def test_cap_accuracy_ratio_replay(spark):
    row = QUERIES["model_cap_accuracy_ratio"](spark, SF).collect()[0]
    os_ = table(spark, SF, "orders").selectExpr(
        "CAST(o_orderstatus = 'F' AS INT) AS y",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s",
    ).collect()
    pos = [r.s for r in os_ if r.y]
    neg = [r.s for r in os_ if not r.y]
    # direct pairwise AUC with half-credit ties — independent of the
    # engine's midrank formula
    wins = ties = 0
    neg_sorted = sorted(neg)
    import bisect

    for p in pos:
        lo = bisect.bisect_left(neg_sorted, p)
        hi = bisect.bisect_right(neg_sorted, p)
        wins += lo
        ties += hi - lo
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row.n == len(os_)
    assert row.np == len(pos)
    assert abs(row.auc_rank - round(auc, 6)) < 1e-6
    assert abs(row.accuracy_ratio - round(2 * auc - 1, 6)) < 1e-6
    assert abs(row.accuracy_ratio - (2 * row.auc_rank - 1)) < 1e-5
    assert -1 <= row.accuracy_ratio <= 1
