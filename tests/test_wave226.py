"""Wave-226: Mantel-Haenszel vs python strata replay (plus crude-OR
contrast); Excel serials vs python date arithmetic and the 1900-bug
anchor property."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import date, timedelta

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_mantel_haenszel_replay(spark):
    row = QUERIES["agg_mantel_haenszel"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts", "event_type").collect()
    strata = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for r in ev:
        s = (r["ts"].date().isoweekday() % 7) + 1
        e = 1 if r["ts"].hour >= 12 else 0
        o = 1 if r["event_type"] == "purchase" else 0
        idx = 0 if (e and o) else 1 if e else 2 if o else 3
        strata[s][idx] += 1
    sa = sadn = sbcn = sea = sva = 0.0
    for s in sorted(strata):
        a, b, c, d = strata[s]
        n = a + b + c + d
        sa += a
        sadn += a * d / n
        sbcn += b * c / n
        sea += (a + b) * (a + c) / n
        sva += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    chi2 = (abs(sa - sea) - 0.5) ** 2 / sva
    assert row["n_strata"] == len(strata)
    assert row["sum_exposed_cases"] == int(sa)
    assert abs(row["or_mh"] - sadn / sbcn) < 1e-5
    assert abs(row["cmh_chi2"] - chi2) < 1e-4
    assert row["significant_5pct"] == (chi2 > 3.841458820694124)
    # MH pools toward the stratum ORs — with near-independent exposure
    # the pooled OR should sit near 1
    assert 0.5 < row["or_mh"] < 2.0


def test_excel_serial_roundtrip(spark):
    rows = QUERIES["fn_excel_serial"](spark, SF).collect()
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in table(spark, SF, "orders").select("o_orderkey", "o_orderdate").collect()
    }
    assert len(rows) == len(orders)
    anchor = date(1899, 12, 30)
    for r in rows[:300]:
        od = orders[r["o_orderkey"]]
        od = od.date() if hasattr(od, "date") else od
        assert r["excel_serial"] == (od - anchor).days
        assert r["roundtrip_date"] == r["order_date"] == od.isoformat()
        assert r["roundtrip_ok"]
    # the anchor encodes the 1900 leap bug: real Excel says 1900-03-01
    # is serial 61; days-since-1899-12-30 agrees
    assert (date(1900, 3, 1) - anchor).days == 61
    # ...and knowingly disagrees by 1 inside Jan-Feb 1900 (phantom Feb 29)
    assert (date(1900, 1, 1) - anchor).days == 2  # Excel calls it 1
