"""Wave-241: GRPO/RLOO advantages vs a per-group python replay (plus the
zero-sum invariants both baselines guarantee), Fightin' Words vs a
from-scratch recompute with explicit prior algebra."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_grpo_advantages_replay(spark):
    rows = {r.doc_id: r for r in QUERIES["pipeline_grpo_advantages"](spark, SF).collect()}
    docs = table(spark, SF, "documents").collect()
    groups = defaultdict(list)
    rewards = {}
    for d in docs:
        r = len(d.text.split(" ")) * 100.0 / d.n_chars
        rewards[d.doc_id] = (d.lang, d.source, r)
        groups[(d.lang, d.source)].append(r)
    assert set(rows) == set(rewards)
    for doc_id, (lang, source, r) in rewards.items():
        g = groups[(lang, source)]
        n = len(g)
        row = rows[doc_id]
        assert row.group_n == n
        assert abs(row.reward - round(r, 6)) < 1e-6
        if n < 2:
            assert row.adv_grpo == 0.0 and row.adv_rloo == 0.0
            continue
        mu = sum(g) / n
        sd = math.sqrt(sum((x - mu) ** 2 for x in g) / (n - 1))
        exp_grpo = 0.0 if sd == 0 else (r - mu) / sd
        exp_rloo = r - (sum(g) - r) / (n - 1)
        assert abs(row.adv_grpo - round(exp_grpo, 6)) < 1e-5
        assert abs(row.adv_rloo - round(exp_rloo, 6)) < 1e-5
    # both baselines are mean-zero within every group (trainer invariant)
    per_group = defaultdict(lambda: [0.0, 0.0, 0])
    for r in rows.values():
        k = (r.lang, r.source)
        per_group[k][0] += r.adv_grpo
        per_group[k][1] += r.adv_rloo
        per_group[k][2] += 1
    for (sg, sr, n) in per_group.values():
        if n >= 2:
            assert abs(sg) < 1e-3 * n and abs(sr) < 1e-3 * n


def test_log_odds_dirichlet_replay(spark):
    out = QUERIES["text_log_odds_dirichlet"](spark, SF).collect()
    docs = table(spark, SF, "documents").collect()
    ya, yb = defaultdict(int), defaultdict(int)
    for d in docs:
        tgt = ya if d.lang == "en" else yb
        for t in d.text.split(" "):
            tgt[t] += 1
    vocab = set(ya) | set(yb)
    na, nb = sum(ya.values()), sum(yb.values())
    nall = na + nb
    a0 = 500.0
    scored = []
    for t in vocab:
        aw = a0 * (ya[t] + yb[t]) / nall
        delta = math.log((ya[t] + aw) / (na + a0 - ya[t] - aw)) - math.log(
            (yb[t] + aw) / (nb + a0 - yb[t] - aw)
        )
        se = math.sqrt(1 / (ya[t] + aw) + 1 / (yb[t] + aw))
        scored.append((t, ya[t], yb[t], delta, delta / se))
    scored.sort(key=lambda x: (-abs(x[4]), x[0]))
    top = scored[:20]
    assert len(out) == min(20, len(vocab))
    for row, (t, a, b, delta, z) in zip(out, top):
        assert row.tok == t
        assert row.ya == a and row.yb == b
        assert abs(row.delta - round(delta, 6)) < 1e-5
        assert abs(row.z - round(z, 6)) < 1e-5
    # en-heavy tokens have positive z, non-en-heavy negative
    for row in out:
        if row.ya > 0 and row.yb == 0:
            assert row.z > 0
        if row.yb > 0 and row.ya == 0:
            assert row.z < 0
