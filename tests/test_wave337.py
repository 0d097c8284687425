"""Wave-337: Chatterjee xi vs a direct python walk; repeated median vs
statistics.median replays; p-chart vs binomial limits."""

from __future__ import annotations

import math
import statistics

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_chatterjee_xi_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) AS us", "event_id", "CAST(ROUND(value*100) AS LONG) AS v"
    ).collect()
    seq = sorted(rows, key=lambda r: (r["us"], r["event_id"]))
    ys = [r["v"] for r in seq]
    n = len(ys)
    sorted_ys = sorted(ys)
    import bisect

    r = [bisect.bisect_right(sorted_ys, y) for y in ys]
    l = [n - bisect.bisect_left(sorted_ys, y) for y in ys]
    sum_dr = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    den = 2 * sum(li * (n - li) for li in l)
    xi = 1 - n * sum_dr / den
    row = QUERIES["agg_chatterjee_xi"](spark, SF).first()
    assert row["n_obs"] == n
    assert row["sum_dr"] == sum_dr
    assert abs(row["xi"] - xi) < 1e-6
    # independence-ish fixture: xi should be small
    assert abs(row["xi"]) < 0.2


def test_siegel_repeated_median_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    agg = {}
    for r in rows:
        nn, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (nn + 1, s + r["p"])
    days = sorted(agg)
    m = [agg[d][1] / 100.0 / agg[d][0] for d in days]
    n = len(m)
    mi = []
    for i in range(n):
        sl = [
            (m[j] - m[i]) / (j - i) for j in range(n) if j != i
        ]
        mi.append(statistics.median(sl))
    slope = statistics.median(mi)
    icept = statistics.median(
        [m[i] - slope * (i + 1) for i in range(n)]
    )
    row = QUERIES["model_siegel_repeated_median"](spark, SF).first()
    assert row["n_days"] == n
    assert abs(row["rm_slope"] - slope) < 1e-6
    assert abs(row["rm_intercept"] - icept) < 1e-6


def test_p_chart_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type"
    ).collect()
    agg = {}
    for r in rows:
        n, e = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, e + (1 if r["event_type"] == "error" else 0))
    tot_n = sum(n for n, _ in agg.values())
    tot_e = sum(e for _, e in agg.values())
    p = tot_e / tot_n
    got = {r["d"]: r for r in QUERIES["events_p_chart"](spark, SF).collect()}
    assert len(got) == len(agg)
    for d, (n, e) in agg.items():
        row = got[d.isoformat()]
        sig = math.sqrt(p * (1 - p) / n)
        ucl, lcl = p + 3 * sig, max(p - 3 * sig, 0.0)
        assert row["n_inspected"] == n and row["defects"] == e
        assert abs(row["p_hat"] - e / n) < 1e-6
        assert abs(row["ucl"] - ucl) < 1e-6
        assert abs(row["lcl"] - lcl) < 1e-6
        assert row["out_of_control"] == (e / n > ucl or e / n < lcl)
