"""Wave-206: item-CF and Slope One vs dict replays of the basket
matrix."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _ratings(spark):
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in table(spark, SF, "orders").select("o_orderkey", "o_custkey").collect()
    }
    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    ).collect()
    r = Counter()
    for row in li:
        if row["l_orderkey"] in orders:
            u = orders[row["l_orderkey"]]
            r[(u, row["l_partkey"])] += int(
                math.floor(row["l_quantity"] * 100 + 0.5)
            )
    return r


def _copairs(ratings):
    by_user = defaultdict(dict)
    for (u, it), v in ratings.items():
        by_user[u][it] = v
    support, diffsum = Counter(), Counter()
    for u, items in by_user.items():
        its = sorted(items)
        for x in range(len(its)):
            for y in range(x + 1, len(its)):
                i, j = its[x], its[y]
                support[(i, j)] += 1
                diffsum[(i, j)] += items[i] - items[j]
    return support, diffsum


def test_item_cf_replay(spark):
    rows = QUERIES["model_item_cf_cosine"](spark, SF).collect()
    ratings = _ratings(spark)
    support, _ = _copairs(ratings)
    item_n = Counter(it for (_, it) in ratings)
    focus = sorted(item_n, key=lambda it: (-item_n[it], it))[:10]
    got = defaultdict(dict)
    for r in rows:
        got[r["focus_item"]][r["rank"]] = r
    assert sorted(got) == sorted(focus)
    for f in focus:
        cands = []
        for (i, j), s in support.items():
            if i == f or j == f:
                nb = j if i == f else i
                cos = s / math.sqrt(item_n[f] * item_n[nb])
                cands.append((-cos, nb, s))
        cands.sort()
        for rank, (negcos, nb, s) in enumerate(cands[:5], 1):
            r = got[f][rank]
            assert r["neighbor"] == nb
            assert r["support"] == s
            assert abs(r["cosine"] - (-negcos)) < 1e-5


def test_slope_one_replay(spark):
    rows = QUERIES["model_slope_one"](spark, SF).collect()
    support, diffsum = _copairs(_ratings(spark))
    top = sorted(support, key=lambda p: (-support[p], p))[:20]
    assert [(r["item_i"], r["item_j"]) for r in rows] == top
    for r in rows:
        p = (r["item_i"], r["item_j"])
        assert r["support"] == support[p]
        expect = round(diffsum[p] / (100.0 * support[p]), 6)
        assert abs(r["avg_dev"] - expect) < 1e-9
