"""Wave-118 semantic checks."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_sample_entropy_matches_numpy_bruteforce(spark):
    r = QUERIES["events_sample_entropy"](spark, SF_SMALL).first()
    daily = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
        .orderBy("day")
        .toPandas()
    )
    x = daily["x"].to_numpy(dtype=np.int64)
    n = len(x)
    s, q = int(x.sum()), int((x * x).sum())
    tol = 0.2 * math.sqrt(n * q - s * s) / n
    b_cnt = a_cnt = 0
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            if max(abs(int(x[i] - x[j])), abs(int(x[i + 1] - x[j + 1]))) <= tol:
                b_cnt += 1
                if (
                    i + 2 < n
                    and j + 2 < n
                    and abs(int(x[i + 2] - x[j + 2])) <= tol
                ):
                    a_cnt += 1
    assert r.n_days == n
    assert abs(r.tolerance_r - round(tol, 6)) < 2e-6
    assert (r.b_matches, r.a_matches) == (b_cnt, a_cnt)
    if a_cnt:
        assert abs(r.sampen - round(-math.log(a_cnt / b_cnt), 6)) < 2e-6
        assert r.sampen >= 0


def _u(key: int, salt: str) -> float:
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8]
    return (int(h, 16) + 1) / 4294967296.0


def test_priority_sample_matches_python_selection(spark):
    rows = QUERIES["sample_priority_topk"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    pdf = (
        table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_totalprice")
        .toPandas()
    )
    pri = sorted(
        (
            (row.o_totalprice / _u(row.o_orderkey, "|pri"), row.o_orderkey)
            for row in pdf.itertuples()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    expect_keys = [k for _, k in pri[:10]]
    tau = pri[10][0]
    got = sorted(rows, key=lambda r: r.rank)
    assert [r.o_orderkey for r in got] == expect_keys
    for r in got:
        assert abs(r.threshold - round(tau, 4)) < 2e-4
        assert abs(r.ht_weight - round(max(r.weight, tau), 4)) < 2e-4
        # every sampled item's priority clears the threshold
        assert r.priority >= r.threshold - 1e-4


def test_bucket_skew_audit_is_consistent(spark):
    r = QUERIES["dq_bucket_skew_audit"](spark, SF_SMALL).first()
    n_rows = table(spark, SF_SMALL, "lineitem").count()
    assert r.n_buckets == 32
    assert r.min_rows >= 1
    assert abs(r.avg_rows - round(n_rows / 32, 2)) < 0.02
    assert r.min_rows <= r.avg_rows <= r.max_rows
    assert r.imbalance_ratio >= 1
    # md5 is uniform: a 32-way split of 6k rows should be within 2x of even
    assert r.imbalance_ratio < 2
    assert 0 <= r.cv < 0.5
    assert 0 <= r.hottest_bucket < 32
