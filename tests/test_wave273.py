"""Wave-273: confident-learning screen vs a Counter-based NB replay
(same integer-scaled space), hazard profile vs a sorted-sweep replay
plus the life-table conservation sum(n_in) == n."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
MARGIN = 2_000_000


def test_label_noise_confident_replay(spark):
    rows = {
        (r.given_lang, r.pred_lang): r
        for r in QUERIES["pipeline_label_noise_confident"](spark, SF).collect()
    }
    docs = table(spark, SF, "documents").collect()
    train = [(d.lang, d.text.lower().split(" ")) for d in docs if d.doc_id % 2 == 0]
    tok_counts = defaultdict(Counter)
    class_tokens = Counter()
    vocab = set()
    for lang, toks in train:
        for t in toks:
            if t:
                tok_counts[lang][t] += 1
                class_tokens[lang] += 1
                vocab.add(t)
    v = len(vocab)
    langs = sorted(class_tokens)

    def l_scaled(lang, tok):
        return math.floor(
            math.log((tok_counts[lang].get(tok, 0) + 1.0) / (class_tokens[lang] + v))
            * 1000000
        )

    agg = defaultdict(lambda: [0, 0])
    for d in docs:
        if d.doc_id % 2 == 0:
            continue
        toks = [t for t in d.text.lower().split(" ") if t and t in vocab]
        scores = {
            lang: sum(l_scaled(lang, t) for t in toks) for lang in langs
        }
        pred = min(scores, key=lambda k: (-scores[k], k))
        own = scores.get(d.given_lang if hasattr(d, "given_lang") else d.lang)
        suspect = (
            pred != d.lang and scores[pred] - own > MARGIN
        )
        agg[(d.lang, pred)][0] += 1
        agg[(d.lang, pred)][1] += 1 if suspect else 0
    assert set(rows) == set(agg)
    for k, (n, s) in agg.items():
        assert rows[k].n_docs == n, k
        assert rows[k].n_suspect == s, k
    # suspects are a subset of off-diagonal cells
    for (g, p), r in rows.items():
        if g == p:
            assert r.n_suspect == 0


def test_hazard_profile_replay(spark):
    rows = {r.decile: r for r in QUERIES["events_hazard_profile"](spark, SF).collect()}
    ev = table(spark, SF, "events").selectExpr(
        "unix_micros(ts) AS t", "event_id"
    ).collect()
    ts = sorted((r.t, r.event_id) for r in ev)
    gaps = sorted((b[0] - a[0]) / 1e6 for a, b in zip(ts, ts[1:]))
    n = len(gaps)
    edges = [gaps[max(1, math.ceil(n * q / 10)) - 1] for q in range(10)]
    gmax = gaps[-1]
    total_in = 0
    for q in range(10):
        lo = edges[q]
        hi = edges[q + 1] if q < 9 else gmax
        if q < 9:
            n_in = sum(1 for g in gaps if lo <= g < hi)
        else:
            n_in = sum(1 for g in gaps if lo <= g <= gmax)
        at_risk = sum(1 for g in gaps if g >= lo)
        r = rows[q]
        assert r.n_in == n_in, q
        assert r.at_risk == at_risk, q
        assert abs(r.lo_s - round(lo, 6)) < 1e-9
        assert abs(r.hi_s - round(hi, 6)) < 1e-9
        hz = 0.0 if hi == lo else n_in / (at_risk * (hi - lo))
        assert abs(r.hazard_per_s - round(hz, 6)) < 1e-6, q
        total_in += n_in
    # life-table conservation: every gap lands in exactly one band
    # (values equal to an interior edge roll into the next band)
    assert total_in == n
