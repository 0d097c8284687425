"""Wave-203: Goodman-Kruskal gamma vs an O(n^2)-free cell replay;
lambda vs the textbook PRE definition."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _events(spark):
    return table(spark, SF, "events").select(
        "ts", "value", "event_type"
    ).collect()


def test_gk_gamma_cell_replay(spark):
    row = QUERIES["agg_gk_gamma"](spark, SF).collect()[0]
    cells = Counter()
    for r in _events(spark):
        x = r["ts"].hour // 6
        cents = int(math.floor(r["value"] * 100 + 0.5))
        y = 0 if cents < 1500 else 1 if cents < 3500 else 2 if cents < 7000 else 3
        cells[(x, y)] += 1
    C = D = 0
    items = list(cells.items())
    for (x1, y1), c1 in items:
        for (x2, y2), c2 in items:
            if (x2 > x1 and y2 > y1) or (x2 < x1 and y2 < y1):
                C += c1 * c2
            elif (x2 > x1 and y2 < y1) or (x2 < x1 and y2 > y1):
                D += c1 * c2
    C, D = C // 2, D // 2
    assert row["n"] == sum(cells.values())
    assert row["concordant"] == C
    assert row["discordant"] == D
    assert abs(row["gamma"] - (C - D) / (C + D)) < 1e-6
    assert -1.0 <= row["gamma"] <= 1.0


def test_gk_lambda_pre_definition(spark):
    row = QUERIES["agg_gk_lambda"](spark, SF).collect()[0]
    cells = Counter()
    for r in _events(spark):
        dow = (r["ts"].date().isoweekday() % 7) + 1
        cells[(dow, r["event_type"])] += 1
    n = sum(cells.values())
    rows_, cols_ = defaultdict(dict), defaultdict(dict)
    for (d, t), c in cells.items():
        rows_[d][t] = c
        cols_[t][d] = c
    srm = sum(max(v.values()) for v in rows_.values())
    scm = sum(max(v.values()) for v in cols_.values())
    mc = max(sum(v.values()) for v in cols_.values())
    mr = max(sum(v.values()) for v in rows_.values())
    assert row["n"] == n
    assert abs(row["lambda_type_given_dow"] - (srm - mc) / (n - mc)) < 1e-6
    assert abs(row["lambda_dow_given_type"] - (scm - mr) / (n - mr)) < 1e-6
    assert (
        abs(
            row["lambda_symmetric"]
            - (srm + scm - mc - mr) / (2 * n - mc - mr)
        )
        < 1e-6
    )
    # PRE measures live in [0, 1]
    for k in (
        "lambda_type_given_dow",
        "lambda_dow_given_type",
        "lambda_symmetric",
    ):
        assert 0.0 <= row[k] <= 1.0
