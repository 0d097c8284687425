"""Wave-183: water-filling vs a pure-Python greedy; KS vs direct CDF scan."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_waterfill_matches_python_greedy(spark):
    rows = {r["source"]: r for r in QUERIES["pipeline_waterfill_budget"](spark, SF).collect()}
    docs = table(spark, SF, "documents").selectExpr(
        "source", "SIZE(SPLIT(text, ' ')) AS toks"
    ).collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        agg[r["source"]][0] += 1
        agg[r["source"]][1] += r["toks"]
    budget = sum(v[1] for v in agg.values()) // 2
    total_w = sum(v[0] for v in agg.values())
    order = sorted(agg, key=lambda s: (agg[s][1] / agg[s][0], s))
    rem_t, rem_w, capped = budget, total_w, set()
    for s in order:
        w, c = agg[s]
        if c * rem_w <= rem_t * w:
            capped.add(s)
            rem_t -= c
            rem_w -= w
        else:
            break  # ratios ascend: nothing later binds
    assert set(rows) == set(agg)
    total_alloc = 0
    for s, (w, c) in agg.items():
        got = rows[s]
        assert got["weight_docs"] == w and got["cap_tokens"] == c
        assert got["is_capped"] == (s in capped), s
        want = c if s in capped else (w * rem_t // rem_w if rem_w else 0)
        assert got["allocated_tokens"] == want, s
        assert got["allocated_tokens"] <= c
        total_alloc += got["allocated_tokens"]
    assert total_alloc <= budget


def test_ks_matches_direct_cdf_scan(spark):
    row = QUERIES["model_ks_lift_separation"](spark, SF).collect()[0]
    o = table(spark, SF, "orders").selectExpr(
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y",
    ).collect()
    pos = sorted(r["s"] for r in o if r["y"] == 1)
    neg = sorted(r["s"] for r in o if r["y"] == 0)
    n1, n0 = len(pos), len(neg)
    import bisect

    best, best_t = -1, None
    for t in sorted({r["s"] for r in o}):
        sep = abs(bisect.bisect_right(pos, t) * n0 - bisect.bisect_right(neg, t) * n1)
        if sep > best:
            best, best_t = sep, t
    assert (row["n_pos"], row["n_neg"]) == (n1, n0)
    assert row["ks_x_n1n0"] == best
    assert row["ks_stat"] == best / (n1 * n0)
    assert row["ks_threshold_cents"] == best_t
    assert 0.0 <= row["ks_stat"] <= 1.0
