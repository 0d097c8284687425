"""Wave-269: KR-20/item analysis vs a counting replay (plus the alpha
bound kr20 <= 1 and the positive-discrimination sanity for a coherent
total), Cochran sizes vs a formula replay plus FPC monotonicity."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
ETS = ("click", "view", "purchase", "signup", "error")


def test_item_analysis_replay(spark):
    rows = {r.item: r for r in QUERIES["model_item_analysis_kr20"](spark, SF).collect()}
    ev = table(spark, SF, "events").select("user_id", "event_type").collect()
    per = defaultdict(lambda: defaultdict(int))
    for r in ev:
        per[r.user_id][r.event_type] += 1
    vecs = []
    for u, cnts in per.items():
        n_all = sum(cnts.values())
        vecs.append([1 if 5 * cnts.get(et, 0) > n_all else 0 for et in ETS])
    n = len(vecs)
    totals = [sum(v) for v in vecs]
    mt = sum(totals) / n
    vart = sum(t * t for t in totals) / n - mt * mt
    ps = [sum(v[k] for v in vecs) / n for k in range(5)]
    kr20 = (
        0.0
        if vart == 0
        else (5 / 4) * (1 - sum(p * (1 - p) for p in ps) / vart)
    )
    for k in range(5):
        c = sum(v[k] * t for v, t in zip(vecs, totals)) / n - ps[k] * mt
        pb = (
            0.0
            if ps[k] in (0, 1) or vart == 0
            else c / (math.sqrt(ps[k] * (1 - ps[k])) * math.sqrt(vart))
        )
        r = rows[k + 1]
        assert r.n_subjects == n
        assert abs(r.difficulty - round(ps[k], 6)) < 1e-9
        assert abs(r.point_biserial - round(pb, 6)) < 1e-6
        assert abs(r.kr20 - round(kr20, 6)) < 1e-6
    assert rows[1].kr20 <= 1 + 1e-9
    # the over-indexing items are COMPOSITIONAL (one type up forces
    # others down), so they anti-correlate and KR-20 is negative —
    # the "not a coherent scale" verdict is the correct reading here
    assert any(r.point_biserial < 0 for r in rows.values())


def test_cochran_size_replay(spark):
    row = QUERIES["sample_cochran_size"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr(
        "CAST(event_type = 'purchase' AS INT) AS b", "value"
    ).collect()
    n = len(ev)
    p = sum(r.b for r in ev) / n
    mu = sum(r.value for r in ev) / n
    var = sum(r.value * r.value for r in ev) / n - mu * mu
    z2 = 1.959964**2
    n0p = z2 * p * (1 - p) / 0.0001
    n0m = z2 * var / (0.02 * mu) ** 2
    assert row.population_n == n
    assert abs(row.pilot_proportion - round(p, 6)) < 1e-9
    assert abs(row.n0_proportion - round(n0p, 4)) < 1e-3
    assert row.n_proportion_fpc == math.ceil(n0p / (1 + (n0p - 1) / n))
    assert abs(row.n0_mean - round(n0m, 4)) < 1e-3
    assert row.n_mean_fpc == math.ceil(n0m / (1 + (n0m - 1) / n))
    # FPC can only shrink the requirement, and never below 1
    assert 1 <= row.n_proportion_fpc <= math.ceil(n0p) + 1
    assert row.n_proportion_fpc <= row.population_n
