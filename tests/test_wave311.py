"""Wave-311: Apdex vs a zone-count replay (plus the spec identities);
error budget vs a daily walk."""

from __future__ import annotations

from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
T = 50_000


def test_apdex_matches_zone_replay(spark):
    rows = {r["event_type"]: r for r in QUERIES["events_apdex"](spark, SF).collect()}
    zones = defaultdict(lambda: [0, 0, 0])
    for r in table(spark, SF, "events").selectExpr(
        "event_type", "CAST(ROUND(value*1000) AS LONG) AS ms"
    ).collect():
        z = 0 if r["ms"] <= T else 1 if r["ms"] <= 4 * T else 2
        zones[r["event_type"]][z] += 1
    for et, (s, t, f) in zones.items():
        r = rows[et]
        n = s + t + f
        assert (r["satisfied"], r["tolerating"], r["frustrated"]) == (s, t, f)
        assert r["n"] == n
        apdex = (s + 0.5 * t) / n
        assert abs(r["apdex"] - apdex) < 1e-6
        assert r["rating"] == (
            "good" if apdex >= 0.94 else "fair" if apdex >= 0.85
            else "poor" if apdex >= 0.70 else "unacceptable"
        )
        # spec identities: zones partition n; apdex in [0, 1]
        assert 0 <= r["apdex"] <= 1


def test_error_budget_matches_daily_walk(spark):
    row = QUERIES["events_error_budget"](spark, SF).first()
    total = Counter()
    errors = Counter()
    for r in table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "event_type"
    ).collect():
        total[r["d"]] += 1
        errors[r["d"]] += r["event_type"] == "error"
    budget = 1 - 0.999
    burns = [errors[d] / total[d] / budget for d in total]
    n_events = sum(total.values())
    n_errors = sum(errors.values())
    assert row["n_days"] == len(total)
    assert row["n_events"] == n_events and row["n_errors"] == n_errors
    rate = n_errors / n_events
    assert abs(row["error_rate"] - rate) < 1e-6
    assert abs(row["budget_consumed_x"] - rate / budget) < 1e-3
    assert abs(row["max_daily_burn_rate"] - max(burns)) < 1e-3
    assert row["fast_burn_days"] == sum(1 for b in burns if b > 14.4)
    assert row["slow_burn_days"] == sum(1 for b in burns if b > 6.0)
    assert row["within_slo"] == (rate <= budget)
    # fast-burn days are a subset of slow-burn days (14.4 > 6)
    assert row["fast_burn_days"] <= row["slow_burn_days"]
