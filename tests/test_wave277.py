"""Wave-277: biweight vs a python replay (plus the robustness property:
the estimate moves less than the mean under the data's own tail), Qn
vs a brute-force pairwise replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_biweight_replay(spark):
    row = QUERIES["agg_biweight_location"](spark, SF).collect()[0]
    vals = [r.value for r in table(spark, SF, "events").select("value").collect()]
    n = len(vals)
    sv = sorted(vals)
    med = sv[math.ceil(n * 0.5) - 1]
    ads = sorted(abs(v - med) for v in vals)
    mad = ads[math.ceil(n * 0.5) - 1]
    swx = sw = 0.0
    rejected = 0
    for v in vals:
        u = (v - med) / (9 * mad)
        w = (1 - u * u) ** 2 if abs(u) < 1 else 0.0
        if w == 0:
            rejected += 1
        swx += w * v
        sw += w
    est = swx / sw
    assert row.n == n
    assert row.n_rejected == rejected
    assert abs(row.median - round(med, 6)) < 1e-9
    assert abs(row.mad - round(mad, 6)) < 1e-9
    assert abs(row.biweight_location - round(est, 6)) < 1e-5
    # the estimate stays between the median and the mean (mild skew)
    mean = sum(vals) / n
    lo, hi = sorted((med, mean))
    assert lo - mad <= row.biweight_location <= hi + mad


def test_qn_scale_replay(spark):
    row = QUERIES["agg_qn_scale"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    ys = [sum(v) / len(v) for _, v in sorted(per.items())]
    n = len(ys)
    diffs = sorted(
        abs(ys[i] - ys[j]) for i in range(n) for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    qn = diffs[k - 1]
    assert row.n_days == n
    assert row.n_pairs == n * (n - 1) // 2
    assert row.k_order == k
    assert abs(row.qn_raw - round(qn, 6)) < 1e-9
    assert abs(row.qn_scaled - round(2.2219 * qn, 6)) < 1e-6
    assert row.qn_raw > 0
