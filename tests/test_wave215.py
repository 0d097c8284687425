"""Wave-215: Aalen-Johansen CIF vs a python replay (with the
closure property CIF1+CIF2+S = 1 at the horizon); Verhoeff vs the
reference python implementation and its error-detection property."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_D = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
    [1, 2, 3, 4, 0, 6, 7, 8, 9, 5],
    [2, 3, 4, 0, 1, 7, 8, 9, 5, 6],
    [3, 4, 0, 1, 2, 8, 9, 5, 6, 7],
    [4, 0, 1, 2, 3, 9, 5, 6, 7, 8],
    [5, 9, 8, 7, 6, 0, 4, 3, 2, 1],
    [6, 5, 9, 8, 7, 1, 0, 4, 3, 2],
    [7, 6, 5, 9, 8, 2, 1, 0, 4, 3],
    [8, 7, 6, 5, 9, 3, 2, 1, 0, 4],
    [9, 8, 7, 6, 5, 4, 3, 2, 1, 0],
]
_P = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
    [1, 5, 7, 6, 2, 8, 3, 0, 9, 4],
    [5, 8, 0, 3, 7, 9, 6, 1, 4, 2],
    [8, 9, 1, 6, 0, 4, 3, 5, 2, 7],
    [9, 4, 5, 3, 1, 2, 6, 8, 7, 0],
    [4, 2, 8, 6, 5, 7, 3, 9, 0, 1],
    [2, 7, 9, 3, 8, 0, 6, 4, 1, 5],
    [7, 0, 4, 6, 9, 1, 3, 2, 5, 8],
]
_INV = [0, 4, 3, 2, 1, 5, 6, 7, 8, 9]


def _verhoeff_check(num: str) -> int:
    c = 0
    for i, ch in enumerate(reversed(num)):
        c = _D[c][_P[(i + 1) % 8][int(ch)]]
    return _INV[c]


def _verhoeff_valid(full: str) -> bool:
    c = 0
    for i, ch in enumerate(reversed(full)):
        c = _D[c][_P[i % 8][int(ch)]]
    return c == 0


def test_competing_risks_replay(spark):
    rows = sorted(
        QUERIES["events_competing_risks"](spark, SF).collect(),
        key=lambda r: r["day_idx"],
    )
    ev = table(spark, SF, "events").select(
        "user_id", "ts", "event_type", "event_id"
    ).collect()
    from datetime import date

    nu = len({r["user_id"] for r in ev})
    first = {}
    for r in sorted(
        ev,
        key=lambda r: ((r["ts"].date() - date(2024, 1, 1)).days, r["event_id"]),
    ):
        if r["event_type"] in ("purchase", "error") and r["user_id"] not in first:
            d = (r["ts"].date() - date(2024, 1, 1)).days
            first[r["user_id"]] = (d, 1 if r["event_type"] == "purchase" else 2)
    byday = defaultdict(lambda: [0, 0])
    for d, cause in first.values():
        byday[d][cause - 1] += 1
    s = 1.0
    at_risk = nu
    cif1 = cif2 = 0.0
    for i, d in enumerate(sorted(byday)):
        d1, d2 = byday[d]
        cif1 += s * d1 / at_risk
        cif2 += s * d2 / at_risk
        r = rows[i]
        assert r["day_idx"] == d
        assert r["n_risk"] == at_risk
        assert r["d_purchase"] == d1
        assert r["d_error"] == d2
        assert abs(r["cif_purchase"] - cif1) < 1e-5
        assert abs(r["cif_error"] - cif2) < 1e-5
        s *= 1 - (d1 + d2) / at_risk
        at_risk -= d1 + d2
    # closure at the horizon: CIF1 + CIF2 + survivors/n == 1
    assert abs(rows[-1]["cif_purchase"] + rows[-1]["cif_error"]
               + (nu - len(first)) / nu - 1.0) < 1e-5


def test_verhoeff_reference_and_error_detection(spark):
    rows = QUERIES["fn_verhoeff"](spark, SF).collect()
    for r in rows[:300]:
        padded = str(r["event_id"]).zfill(10)
        assert r["padded_id"] == padded
        assert r["check_digit"] == _verhoeff_check(padded)
        assert r["self_validates"]
        assert _verhoeff_valid(padded + str(r["check_digit"]))
    # the defining property: adjacent transpositions are ALWAYS caught
    full = rows[0]["padded_id"] + str(rows[0]["check_digit"])
    for i in range(len(full) - 1):
        if full[i] != full[i + 1]:
            swapped = (
                full[:i] + full[i + 1] + full[i] + full[i + 2 :]
            )
            assert not _verhoeff_valid(swapped)
