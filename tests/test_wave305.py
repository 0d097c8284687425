"""Wave-305: Kingman VUT vs a python moment replay (plus the variability
premium invariant); XYZ classes vs a per-part CV replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kingman_matches_moment_replay(spark):
    row = QUERIES["events_kingman_vut"](spark, SF).first()
    rows = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) AS t", "CAST(ROUND(value*1000) AS LONG) AS m"
    ).collect()
    ts = sorted({r["t"] for r in rows})
    gaps = [(b - a) / 1e6 for a, b in zip(ts, ts[1:])]
    # zero gaps from same-ts events count toward the moments
    n_gaps = len(rows) - 1
    s1 = sum(gaps)
    s2 = sum(g * g for g in gaps)
    tau = s1 / n_gaps
    ca2 = (s2 / n_gaps - tau * tau) / (tau * tau)
    svc = [r["m"] / 1000 for r in rows]
    es = sum(svc) / len(svc)
    cs2 = (sum(s * s for s in svc) / len(svc) - es * es) / (es * es)
    rho = es / tau
    assert row["n_gaps"] == n_gaps
    assert abs(row["mean_interarrival_s"] - tau) < 1e-4
    assert abs(row["ca2"] - ca2) < 1e-4
    assert abs(row["cs2"] - cs2) < 1e-4
    assert abs(row["rho"] - rho) < 1e-6
    wq = rho / (1 - rho) * (ca2 + cs2) / 2 * es
    assert abs(row["kingman_wq_s"] - wq) < max(1e-4, abs(wq) * 1e-3)
    # the variability premium: Kingman vs M/M/1 is exactly (ca2+cs2)/2
    assert abs(
        row["kingman_wq_s"] - row["mm1_wq_s"] * (ca2 + cs2) / 2
    ) < max(1e-4, abs(wq) * 1e-2)


def test_xyz_matches_cv_replay(spark):
    rows = {r["xyz_class"]: r for r in QUERIES["warehouse_xyz_analysis"](spark, SF).collect()}
    import datetime as dt

    weekly = defaultdict(lambda: defaultdict(int))
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in table(spark, SF, "orders").select("o_orderkey", "o_orderdate").collect()
    }
    for r in table(spark, SF, "lineitem").select(
        "l_partkey", "l_orderkey", "l_quantity"
    ).collect():
        d = orders[r["l_orderkey"]]
        wk = d - dt.timedelta(days=d.weekday())  # Monday truncation
        weekly[r["l_partkey"]][wk] += int(r["l_quantity"])
    cls = defaultdict(list)
    for qs in weekly.values():
        vals = list(qs.values())
        if len(vals) == 1:
            cv = 0.0
        else:
            m = sum(vals) / len(vals)
            cv = math.sqrt(sum(v * v for v in vals) / len(vals) - m * m) / m
        cls["X" if cv < 0.5 else "Y" if cv < 1.0 else "Z"].append((cv, len(vals)))
    assert set(rows) == {k for k, v in cls.items() if v}
    for k, items in cls.items():
        if not items:
            continue
        r = rows[k]
        assert r["n_parts"] == len(items)
        assert abs(r["avg_cv"] - sum(c for c, _ in items) / len(items)) < 1e-5
        assert abs(
            r["avg_active_weeks"] - sum(w for _, w in items) / len(items)
        ) < 1e-5
