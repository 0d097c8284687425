"""Wave-307: chain-ladder ultimates vs a python triangle replay AND vs the
true (complete-data) ultimates; Dunning keyness vs a contingency replay."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _triangle(spark):
    orders = {
        r["o_orderkey"]: r["o_orderdate"].year
        for r in table(spark, SF, "orders").select("o_orderkey", "o_orderdate").collect()
    }
    inc = defaultdict(int)
    true_ult = defaultdict(int)
    for r in table(spark, SF, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    ).collect():
        oy = orders[r["l_orderkey"]]
        sy = r["l_shipdate"].year
        if sy < oy:
            continue
        cents = int(round(r["l_extendedprice"] * 100))
        inc[(oy, sy - oy)] += cents
        true_ult[oy] += cents
    return inc, true_ult


def test_chain_ladder_matches_triangle_replay(spark):
    rows = {r["origin_year"]: r for r in QUERIES["warehouse_chain_ladder"](spark, SF).collect()}
    inc, true_ult = _triangle(spark)
    tmax = max(o + lag for o, lag in inc)
    cum = {}
    for (o, lag), v in sorted(inc.items()):
        cum[(o, lag)] = cum.get((o, lag - 1), 0) + v
    known = {(o, lag): c for (o, lag), c in cum.items() if o + lag <= tmax}
    lags = sorted({lag for _, lag in known})
    f = {}
    for k in lags:
        num = sum(known[(o, k + 1)] for o, kk in known if kk == k and (o, k + 1) in known)
        den = sum(known[(o, k)] for o, kk in known if kk == k and (o, k + 1) in known)
        if den:
            f[k] = num / den
    for o in sorted({oo for oo, _ in known}):
        dev = max(lag for oo, lag in known if oo == o)
        c_latest = known[(o, dev)]
        tail = math.prod(v for k, v in f.items() if k >= dev)
        r = rows[o]
        assert r["dev_years_known"] == dev
        assert abs(r["latest_cum_dollars"] - c_latest / 100) < 0.011
        assert abs(r["ultimate_dollars"] - c_latest / 100 * tail) < max(
            0.02, abs(c_latest / 100 * tail) * 1e-5
        )
        assert abs(r["completion_pct"] - 1 / tail) < 1e-5
        # the oldest origin year is fully developed: ultimate == latest
        if o + dev == tmax and dev == max(lags) + 1:
            assert r["completion_pct"] == 1.0
    # sanity vs TRUTH: the fixture is complete, so projections for origin
    # years with at least two known development years should land within
    # the right order of magnitude of the realized ultimate. The YOUNGEST
    # origin (known at lag 0 only, and a partial calendar year of orders)
    # gets no calibration promise on this synthetic fixture — the ship
    # years are uniform rather than genuinely developing — so it only has
    # to respect ultimate >= latest (factors are >= 1 here).
    for o, r in rows.items():
        if r["dev_years_known"] >= 2:
            assert 0.2 < r["ultimate_dollars"] / (true_ult[o] / 100) < 5.0
        assert r["ultimate_dollars"] >= r["latest_cum_dollars"] - 0.01


def test_keyness_matches_contingency_replay(spark):
    rows = QUERIES["text_keyness_dunning"](spark, SF).collect()
    cnt = defaultdict(Counter)
    for d in table(spark, SF, "documents").select("source", "text").collect():
        cnt[d["source"]].update(d["text"].split(" "))
    tok_tot = Counter()
    for c in cnt.values():
        tok_tot.update(c)
    n = sum(tok_tot.values())
    by_src = defaultdict(list)
    for src, c in cnt.items():
        ns = sum(c.values())
        for w, o11 in c.items():
            tw = tok_tot[w]
            o12, o21, o22 = tw - o11, ns - o11, n - tw - ns + o11
            if not (o11 / ns > o12 / (n - ns)):
                continue
            e11 = ns * tw / n
            e12 = (n - ns) * tw / n
            e21 = ns * (n - tw) / n
            e22 = (n - ns) * (n - tw) / n
            g2 = 2 * sum(
                o * math.log(o / e)
                for o, e in ((o11, e11), (o12, e12), (o21, e21), (o22, e22))
                if o > 0
            )
            by_src[src].append((round(g2, 6), w, o11))
    for r in rows:
        top = sorted(by_src[r["source"]], key=lambda t: (-t[0], t[1]))
        g2, w, o11 = top[r["rank"] - 1]
        assert r["keyword"] == w
        assert r["freq_in_source"] == o11
        assert abs(r["g2_keyness"] - g2) < 1e-5
    assert {r["rank"] for r in rows} == {1, 2, 3}
