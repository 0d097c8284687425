"""Wave-304: segregation indices vs a python cell replay (plus the D/P*
invariants); Palma ratio vs a sorted-list share replay."""

from __future__ import annotations

from collections import Counter

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_segregation_matches_cell_replay(spark):
    row = QUERIES["pipeline_segregation_duncan"](spark, SF).first()
    cell = Counter()
    for d in table(spark, SF, "documents").select("source", "lang").collect():
        cell[(d["source"], d["lang"])] += 1
    by_lang = Counter()
    for (_, lang), n in cell.items():
        by_lang[lang] += n
    (la, _), (lb, _) = sorted(by_lang.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    sources = sorted({s for s, _ in cell})
    a = {s: cell.get((s, la), 0) for s in sources}
    b = {s: cell.get((s, lb), 0) for s in sources}
    ta, tb = sum(a.values()), sum(b.values())
    ab_sources = [s for s in sources if a[s] + b[s] > 0]
    d_idx = 0.5 * sum(abs(a[s] / ta - b[s] / tb) for s in ab_sources)
    exposure = sum(
        (a[s] / ta) * (b[s] / (a[s] + b[s])) for s in ab_sources
    )
    isolation = sum(
        (a[s] / ta) * (a[s] / (a[s] + b[s])) for s in ab_sources
    )
    assert row["n_lang_a"] == ta and row["n_lang_b"] == tb
    assert abs(row["duncan_d"] - d_idx) < 1e-6
    assert abs(row["exposure_ab"] - exposure) < 1e-6
    assert abs(row["isolation_a"] - isolation) < 1e-6
    # invariants: D in [0,1]; exposure + isolation = 1 for the two-group case
    assert 0 <= row["duncan_d"] <= 1
    assert abs(row["exposure_ab"] + row["isolation_a"] - 1) < 1e-6


def test_palma_matches_sorted_share_replay(spark):
    row = QUERIES["agg_palma_ratio"](spark, SF).first()
    vs = sorted(
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = len(vs)
    total = sum(vs)
    bottom40 = sum(vs[: int(0.4 * n)])
    top10 = sum(vs[int(0.9 * n) :])
    bottom20 = sum(vs[: int(0.2 * n)])
    top20 = sum(vs[int(0.8 * n) :])
    assert row["n_obs"] == n
    assert abs(row["top10_share"] - top10 / total) < 1e-6
    assert abs(row["bottom40_share"] - bottom40 / total) < 1e-6
    assert abs(row["palma_ratio"] - top10 / bottom40) < 1e-5
    assert abs(row["ratio_2020"] - top20 / bottom20) < 1e-5
    # tails cannot hold less than their population share of a sorted sum
    assert row["top10_share"] >= 0.1 - 1e-6
    assert row["bottom40_share"] <= 0.4 + 1e-6
