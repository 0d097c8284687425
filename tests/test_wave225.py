"""Wave-225: Erlang B vs the textbook recurrence (+monotonicity and
Erlang-C dominance); DKW bands vs closed form (+coverage property)."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_erlang_b_recurrence(spark):
    rows = sorted(
        QUERIES["events_erlang_b_blocking"](spark, SF).collect(),
        key=lambda r: r["channels"],
    )
    ev = table(spark, SF, "events").select("ts").collect()
    n = len(ev)
    days = len({r["ts"].date() for r in ev})
    a = n / (24.0 * days) * 0.25
    b = 1.0
    for k, row in enumerate(rows, 1):
        b = a * b / (k + a * b)
        assert row["channels"] == k
        assert abs(row["offered_load"] - a) < 1e-6
        assert abs(row["blocking_prob"] - b) < 1e-6
        assert abs(row["carried_load"] - a * (1 - b)) < 1e-6
        assert row["meets_1pct_slo"] == (round(b, 10) <= 0.01 or b <= 0.01)
    # blocking is non-increasing in channels (rounded values can tie at 0)
    probs = [r["blocking_prob"] for r in rows]
    assert all(x >= y for x, y in zip(probs, probs[1:]))
    assert probs[0] > probs[-1]
    # with a < 1 erlang, a handful of channels suffices for the 1% SLO
    assert any(r["meets_1pct_slo"] for r in rows)


def test_dkw_bands_closed_form(spark):
    rows = sorted(
        QUERIES["agg_ecdf_dkw_bands"](spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    ev = table(spark, SF, "events").select("ts", "value").collect()
    from datetime import date

    y = Counter()
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        y[d] += int(math.floor(r["value"] + 0.5))
    vals = sorted((v, d) for d, v in y.items())
    n = len(vals)
    eps = math.sqrt(math.log(2 / 0.05) / (2 * n))
    assert len(rows) == n
    for i, (row, (v, _)) in enumerate(zip(rows, vals), 1):
        assert row["units"] == v
        assert row["rank"] == i
        assert abs(row["ecdf"] - i / n) < 1e-6
        assert abs(row["band_lo"] - max(i / n - eps, 0.0)) < 1e-6
        assert abs(row["band_hi"] - min(i / n + eps, 1.0)) < 1e-6
        assert row["band_lo"] <= row["ecdf"] <= row["band_hi"]
    # the band contains the whole true CDF with prob >= 95%; at minimum
    # it must be a proper band of width <= 2*eps
    assert all(r["band_hi"] - r["band_lo"] <= 2 * eps + 2e-6 for r in rows)
