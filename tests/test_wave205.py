"""Wave-205: cohort LTV vs a dict replay; fertility vs re.findall."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_cohort_ltv_replay(spark):
    rows = {
        (r["cohort_week"], r["age_week"]): r
        for r in QUERIES["events_cohort_ltv"](spark, SF).collect()
    }
    ev = table(spark, SF, "events").select("user_id", "ts", "value").collect()
    from datetime import date

    first = {}
    recs = []
    for r in ev:
        d = (r["ts"].date() - date(2024, 1, 1)).days
        c = int(math.floor(r["value"] * 100 + 0.5))
        recs.append((r["user_id"], d, c))
        if r["user_id"] not in first or d < first[r["user_id"]]:
            first[r["user_id"]] = d
    cohort_users = Counter(f // 7 for f in first.values())
    cells = Counter()
    for u, d, c in recs:
        cells[(first[u] // 7, (d - first[u]) // 7)] += c
    assert set(rows) == set(cells)
    for cw in {k[0] for k in cells}:
        ages = sorted(a for c, a in cells if c == cw)
        cum = 0
        for a in ages:
            cum += cells[(cw, a)]
            r = rows[(cw, a)]
            assert r["cohort_users"] == cohort_users[cw]
            assert r["rev_cents"] == cells[(cw, a)]
            assert r["cum_rev_cents"] == cum
            expect = round(cum / (100.0 * cohort_users[cw]), 6)
            assert abs(r["ltv_per_user"] - expect) < 1e-9
        # LTV is nondecreasing in age (revenue is nonnegative)
        ltvs = [rows[(cw, a)]["ltv_per_user"] for a in ages]
        assert ltvs == sorted(ltvs)


def test_tokenizer_fertility_refindall(spark):
    rows = {r["lang"]: r for r in QUERIES["pipeline_tokenizer_fertility"](spark, SF).collect()}
    docs = table(spark, SF, "documents").select("lang", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")
    for d in docs:
        if not d["text"]:
            continue
        a = agg[d["lang"]]
        toks = d["text"].split(" ")
        a[0] += 1
        a[1] += len(toks)
        a[2] += len(pat.findall(d["text"]))
        a[3] += sum(math.ceil(len(t) / 4.0) for t in toks)
    assert set(rows) == set(agg)
    for lang, (nd, ws, rx, c4) in agg.items():
        r = rows[lang]
        assert r["n_docs"] == nd
        assert r["ws_tokens"] == ws
        assert r["regex_tokens"] == rx
        assert r["char4_tokens"] == c4
        assert abs(r["fertility_regex"] - rx / ws) < 1e-6
        assert abs(r["fertility_char4"] - c4 / ws) < 1e-6
        # a subword scheme never produces fewer tokens than words here
        assert r["fertility_char4"] >= 1.0
