"""Wave-286: positional entropy vs a Counter replay (plus the
consistency top_token_share >= exp(-entropy), an entropy inequality),
VALUES dim vs a literal-weights replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
WTS = {"click": 1, "view": 1, "purchase": 10, "signup": 5, "error": -2}


def test_positional_entropy_replay(spark):
    rows = {r.position: r for r in QUERIES["text_positional_entropy"](spark, SF).collect()}
    docs = [r.text.split(" ") for r in table(spark, SF, "documents").collect()]
    for p in range(1, 11):
        cnt = Counter(t[p - 1] for t in docs if len(t) >= p)
        n = sum(cnt.values())
        ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
        r = rows[p]
        assert r.vocab == len(cnt)
        assert r.n_docs == n
        assert abs(r.entropy - round(ent, 6)) < 1e-6
        assert abs(r.top_token_share - round(max(cnt.values()) / n, 6)) < 1e-9
        # max-share bound: p_max >= exp(-H) always
        assert r.top_token_share >= math.exp(-r.entropy) - 1e-9


def test_values_inline_dim_replay(spark):
    rows = {r.event_type: r for r in QUERIES["sql_values_inline_dim"](spark, SF).collect()}
    cnt = Counter(
        r.event_type for r in table(spark, SF, "events").select("event_type").collect()
    )
    assert set(rows) == set(cnt)
    for et, n in cnt.items():
        r = rows[et]
        assert r.n_events == n
        assert r.weight == WTS[et]
        assert r.weighted_score == n * WTS[et]
