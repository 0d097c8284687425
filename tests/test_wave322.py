"""Wave-322: the scan statistic vs an exhaustive python window walk."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_scan_statistic_matches_exhaustive_walk(spark):
    row = QUERIES["events_scan_statistic"](spark, SF).first()
    days = Counter(
        r["d"]
        for r in table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d").collect()
    )
    ds = sorted(days)
    xs = [days[d] for d in ds]
    n = len(xs)
    ctot = sum(xs)
    pref = [0]
    for x in xs:
        pref.append(pref[-1] + x)
    best = (-1.0, None, None, 0, 0.0)
    for i in range(n):
        for j in range(i, n):
            c = pref[j + 1] - pref[i]
            e = ctot * (j - i + 1) / n
            if c > e and c < ctot:
                llr = c * math.log(c / e) + (ctot - c) * math.log(
                    (ctot - c) / (ctot - e)
                )
            else:
                llr = 0.0
            key = (llr, ds[i], ds[j])
            # argmax with (llr desc, start asc, end asc) tie policy
            if llr > best[0] or (
                llr == best[0]
                and best[1] is not None
                and (ds[i], ds[j]) < (best[1], best[2])
            ):
                best = (llr, ds[i], ds[j], c, e)
    llr, ws, we, c, e = best
    assert row["win_start"] == ws.strftime("%Y-%m-%d")
    assert row["win_end"] == we.strftime("%Y-%m-%d")
    assert row["observed"] == c
    assert abs(row["expected"] - e) < 1e-4
    assert abs(row["llr"] - llr) < 1e-4
    assert abs(row["relative_risk"] - c / e) < 1e-5
    # the winner is a hotspot by construction
    assert row["relative_risk"] > 1
    assert row["llr"] >= 0
