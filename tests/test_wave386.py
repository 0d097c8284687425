"""Wave-386 pytests: Fano factor + Higuchi FD replayed in pure Python."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_fano_factor_matches_pure_python(spark):
    rows = {r["window_unit"]: r for r in QUERIES["events_fano_factor"](spark, SF).collect()}
    ts = [r["ts"] for r in table(spark, SF, "events").select("ts").collect()]
    import datetime as dt

    def trunc(t, unit):
        if unit == "hour":
            return t.replace(minute=0, second=0, microsecond=0)
        if unit == "day":
            return t.replace(hour=0, minute=0, second=0, microsecond=0)
        d = t.date() - dt.timedelta(days=t.weekday())  # ISO week start
        return dt.datetime.combine(d, dt.time())

    secs = {"hour": 3600, "day": 86400, "week": 604800}
    for unit in ("hour", "day", "week"):
        counts: dict = {}
        for t in ts:
            counts[trunc(t, unit)] = counts.get(trunc(t, unit), 0) + 1
        lo, hi = trunc(min(ts), unit), trunc(max(ts), unit)
        w = int((hi - lo).total_seconds() // secs[unit]) + 1
        n = sum(counts.values())
        s2 = sum(c * c for c in counts.values())
        r = rows[unit]
        assert r["n_windows"] == w
        assert r["n_events"] == n
        assert r["sum_c2"] == s2
        fano = (w * s2 - n * n) / (w * n)
        assert abs(r["fano"] - round(fano, 6)) <= 1e-9
        # empty windows included: a clustered process has fano > 1 only
        # if variance across ALL w windows says so
        assert w >= len(counts)


def test_higuchi_fd_matches_pure_python(spark):
    row = QUERIES["events_higuchi_fd"](spark, SF).first()
    daily = (
        table(spark, SF, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    xs = [c for _d, c in sorted((r["day"], r["c"]) for r in daily)]
    n = len(xs)
    assert row["n_days"] == n
    pts = []
    for k in range(1, 5):
        sum_abs = 0
        lk_terms = []
        for m in range(1, k + 1):
            idxs = list(range(m, n + 1, k))
            diffs = [abs(xs[idxs[i] - 1] - xs[idxs[i - 1] - 1]) for i in range(1, len(idxs))]
            if not diffs:
                continue
            sum_abs += sum(diffs)
            lk_terms.append(sum(diffs) * (n - 1) / (len(diffs) * k * k))
        assert row[f"sum_abs_k{k}"] == sum_abs
        pts.append((math.log(k), math.log(sum(lk_terms) / k)))
    np_ = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    fd = -(np_ * sxy - sx * sy) / (np_ * sxx - sx * sx)
    assert abs(row["higuchi_fd"] - round(fd, 6)) <= 1e-5
    # FD of a 1-D series lives in [1, 2] (loose band for fixture noise)
    assert 0.8 <= row["higuchi_fd"] <= 2.2
