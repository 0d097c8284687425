"""Wave-199: dup-ngram coverage vs an interval-union python replay; RRF
vs a dict replay; networkdays vs a day-by-day weekday loop."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import date, timedelta

import numpy as np

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dupngram_coverage_interval_union(spark):
    rows = {r["doc_id"]: r for r in QUERIES["pipeline_dupngram_char_coverage"](spark, SF).collect()}
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    checked = 0
    for d in docs:
        text = d["text"]
        if not text:
            assert d["doc_id"] not in rows
            continue
        toks = text.split(" ")
        starts = []
        c = 0
        for t in toks:
            starts.append(c)
            c += len(t) + 1
        grams = defaultdict(list)
        for i in range(len(toks) - 4):
            g = " ".join(toks[i : i + 5])
            grams[g].append((starts[i], starts[i + 4] + len(toks[i + 4])))
        spans = sorted(
            s for g, occ in grams.items() if len(occ) >= 2 for s in occ
        )
        covered = 0
        cur_s = cur_e = None
        for s, e in spans:
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s > cur_e:
                covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_s is not None:
            covered += cur_e - cur_s
        r = rows[d["doc_id"]]
        assert r["n_chars"] == len(text)
        assert r["dup_ngram_chars"] == covered
        assert abs(r["coverage"] - round(covered / len(text), 6)) < 1e-9
        checked += 1
    assert checked == len(rows)


def test_rrf_replay(spark):
    rows = QUERIES["sim_rank_fusion_rrf"](spark, SF).collect()
    emb = table(spark, SF, "embeddings").collect()
    X = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * 1e6
    ).astype(np.int64)
    ids = np.array([r["vec_id"] for r in emb])
    o = np.argsort(ids)
    X, ids = X[o], ids[o]
    got = defaultdict(dict)
    for r in rows:
        got[r["probe_id"]][r["neighbor_id"]] = r
    assert sorted(got) == list(ids[:3])
    for p in ids[:3]:
        pi = int(np.where(ids == p)[0][0])
        dots = X @ X[pi]
        xx = (X * X).sum(axis=1)
        l2 = xx[pi] + xx - 2 * dots
        cand = [int(i) for i in range(len(ids)) if ids[i] != p]
        by_dot = sorted(cand, key=lambda j: (-dots[j], ids[j]))
        by_l2 = sorted(cand, key=lambda j: (l2[j], ids[j]))
        rd = {ids[j]: r + 1 for r, j in enumerate(by_dot)}
        rl = {ids[j]: r + 1 for r, j in enumerate(by_l2)}
        score = {
            ids[j]: int(np.floor(1e9 / (60 + rd[ids[j]])))
            + int(np.floor(1e9 / (60 + rl[ids[j]])))
            for j in cand
        }
        top = sorted(score, key=lambda n: (-score[n], n))[:5]
        assert sorted(got[p], key=lambda n: got[p][n]["fused_rank"]) == top
        for n in top:
            r = got[p][n]
            assert r["rank_dot"] == rd[n]
            assert r["rank_l2"] == rl[n]
            assert r["rrf_nano"] == score[n]


def test_networkdays_day_loop(spark):
    rows = QUERIES["fn_networkdays"](spark, SF).collect()
    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    ).collect()
    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in table(spark, SF, "orders").select("o_orderkey", "o_orderdate").collect()
    }
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
    # reconstruct the ship date from calendar_days instead
    assert len(rows) == len(li)
    for r in rows[:300]:
        od = orders[r["l_orderkey"]]
        sd = od + timedelta(days=r["calendar_days"])
        # brute force: signed weekday count — weekdays in (order, ship]
        # when ship >= order, minus weekdays in (ship, order] otherwise
        # (the synthetic fixture has ship dates on both sides)
        lo, hi = (od, sd) if od <= sd else (sd, od)
        bd = 0
        d = lo
        while d < hi:
            d = d + timedelta(days=1)
            if d.isoweekday() <= 5:
                bd += 1
        if sd < od:
            bd = -bd
        assert r["business_days"] == bd
