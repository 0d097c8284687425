"""Wave-119 semantic checks."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def _daily_counts(spark):
    pdf = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .toPandas()
    )
    return pdf["x"].to_numpy(dtype=np.int64), pdf["day"].tolist()


def test_dfa_alpha_matches_numpy_bruteforce(spark):
    r = QUERIES["events_dfa_alpha"](spark, SF_SMALL).first()
    x, _ = _daily_counts(spark)
    n, s = len(x), int(x.sum())
    y = n * np.cumsum(x) - np.arange(1, n + 1, dtype=np.int64) * s
    meds = {}
    for m in (4, 16):
        fms = []
        for b in range(n // m):
            w = y[b * m : (b + 1) * m].astype(object)
            j = np.arange(1, m + 1, dtype=object)
            msyy = m * sum(v * v for v in w) - sum(w) ** 2
            msxy = m * sum(jj * v for jj, v in zip(j, w)) - sum(j) * sum(w)
            msxx = m * m * (m * m - 1) // 12
            sse = (float(msyy) - float(msxy) ** 2 / msxx) / m
            fms.append(math.sqrt(max(sse, 0.0)))
        fms.sort()
        meds[m] = (len(fms), fms[(len(fms) + 1) // 2 - 1])
    assert (r.n_boxes_4, r.n_boxes_16) == (meds[4][0], meds[16][0])
    assert abs(r.f_med_4 - round(meds[4][1], 4)) < 1e-3
    assert abs(r.f_med_16 - round(meds[16][1], 4)) < 1e-3
    expect = math.log(meds[16][1] / meds[4][1]) / math.log(4)
    assert abs(r.dfa_alpha - round(expect, 6)) < 1e-5
    # detrended fluctuation grows with scale
    assert r.f_med_16 > r.f_med_4


def test_diversity_indices_match_python_counts(spark):
    rows = {
        r.source: r
        for r in QUERIES["text_diversity_indices"](spark, SF_SMALL).collect()
    }
    pdf = table(spark, SF_SMALL, "documents").select("source", "text").toPandas()
    for src, g in pdf.groupby("source"):
        c = Counter()
        for t in g["text"]:
            c.update(t.split(" "))
        n = sum(c.values())
        rep = sum(v * (v - 1) for v in c.values())
        r = rows[src]
        assert r.n_tokens == n and r.vocab == len(c)
        assert abs(r.simpson_d - round(rep / (n * (n - 1)), 6)) < 2e-6
        assert abs(r.inv_simpson - round(n * (n - 1) / rep, 4)) < 2e-4
        assert abs(r.berger_parker - round(max(c.values()) / n, 6)) < 2e-6
        assert abs(r.margalef - round((len(c) - 1) / math.log(n), 4)) < 2e-4
        # unbiased inverse Simpson is an effective-type count near [1, vocab]
        # (the without-replacement estimator may exceed vocab slightly for
        # near-uniform distributions, unlike the plug-in 1/sum(p^2))
        assert 1 <= r.inv_simpson <= r.vocab * 1.05
        assert abs(r.inv_simpson * r.simpson_d - 1) < 1e-3


def test_page_hinkley_matches_python_replay(spark):
    r = QUERIES["events_page_hinkley"](spark, SF_SMALL).first()
    x, days = _daily_counts(spark)
    cum = 0
    u = 0
    run_min = 0
    alarms = []
    max_dev = 0
    lam = 3 * (int(x.sum()) // len(x))
    for i, (xi, day) in enumerate(zip(x, days), start=1):
        cum += int(xi)
        u += int(xi) - cum // i
        run_min = min(run_min, u)
        dev = u - run_min
        max_dev = max(max_dev, dev)
        if dev > lam:
            alarms.append(day)
    assert r.n_days == len(x)
    assert r["lambda"] == lam
    assert r.n_alarm_days == len(alarms)
    if alarms:
        assert r.first_alarm_day == alarms[0].strftime("%Y-%m-%d")
    else:
        assert r.first_alarm_day is None
    assert r.max_deviation == max_dev
