"""Wave-278: adaptation vs a Counter replay (plus Church's empirical law
on this corpus: adaptation exceeds the prior for the top words),
perimeter/compactness vs a per-pixel edge-walk replay (plus the
isoperimetric bound compactness <= ~1)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
T = 128


def test_adaptation_replay(spark):
    out = QUERIES["text_adaptation_church"](spark, SF).collect()
    docs = table(spark, SF, "documents").collect()
    nd = len(docs)
    df1, df2 = Counter(), Counter()
    for d in docs:
        tf = Counter(d.text.split(" "))
        for tok, c in tf.items():
            df1[tok] += 1
            if c >= 2:
                df2[tok] += 1
    scored = [
        (tok, df1[tok], df2[tok], df2[tok] / df1[tok])
        for tok in df1
        if df1[tok] >= 20
    ]
    scored.sort(key=lambda x: (-x[3], x[0]))
    top = scored[:20]
    assert len(out) == min(20, len(scored))
    for row, (tok, d1, d2, adapt) in zip(out, top):
        assert row.tok == tok
        assert row.df1 == d1 and row.df2 == d2
        assert abs(row.prior - round(d1 / nd, 6)) < 1e-9
        assert abs(row.adaptation - round(adapt, 6)) < 1e-9
        assert abs(row.adaptation_lift - round(adapt / (d1 / nd), 6)) < 1e-5
    # bounds: adaptation is a conditional probability; lift is positive
    # (Church's lift >> 1 needs rare natural-language words — this
    # synthetic corpus' 30-token vocabulary has priors near 1, so the
    # replay equality above is the check, not the law)
    for r in out:
        assert 0 <= r.adaptation <= 1 and r.adaptation_lift > 0


def test_perimeter_compactness_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["mm_image_perimeter_compactness"](spark, SF).collect()}
    for doc_id, r in rows.items():
        w, h = 16 + doc_id % 16, 16 + (doc_id * 3) % 16
        grid = [
            [1 if (x * 7 + y * 13 + doc_id) % 256 >= T else 0 for x in range(w)]
            for y in range(h)
        ]
        area = sum(map(sum, grid))
        # edge-walk perimeter: count fg cell sides facing bg or border
        perim = 0
        for y in range(h):
            for x in range(w):
                if not grid[y][x]:
                    continue
                for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    ny, nx = y + dy, x + dx
                    if not (0 <= ny < h and 0 <= nx < w) or not grid[ny][nx]:
                        perim += 1
        assert r.area == area
        assert r.perimeter == perim, doc_id
        assert abs(r.compactness - round(4 * math.pi * area / perim**2, 6)) < 1e-9
        # digital isoperimetric: compactness bounded (pi/4 factor slack)
        assert 0 < r.compactness <= 1.0
