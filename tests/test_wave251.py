"""Wave-251: Spark's soundex builtin vs a from-spec python American
Soundex (the NARA H/W rule), Benford-2 vs a digit-histogram replay with
the probability-mass sanity."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_MAP = {}
for letters, d in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
    ("HW", "-"),
):
    for ch in letters:
        _MAP[ch] = d


def _soundex(tok: str) -> str:
    up = tok.upper()
    codes = [_MAP.get(c, "0") for c in up]
    nohw = [c for c in codes if c != "-"]
    dedup = [c for i, c in enumerate(nohw) if i == 0 or c != nohw[i - 1]]
    rest = dedup if up[0] in "HW" else dedup[1:]
    digits = [c for c in rest if c != "0"][:3]
    return up[0] + "".join(digits).ljust(3, "0")


def test_soundex_matches_spec(spark):
    # the builtin must equal the from-spec implementation on every token
    toks = {
        r.tok
        for r in table(spark, SF, "part")
        .selectExpr("explode(split(p_name, ' ')) AS tok")
        .where("length(tok) > 0")
        .distinct()
        .collect()
    }
    got = {
        r.tok: r.sx
        for r in table(spark, SF, "part")
        .selectExpr("explode(split(p_name, ' ')) AS tok")
        .where("length(tok) > 0")
        .distinct()
        .selectExpr("tok", "soundex(tok) AS sx")
        .collect()
    }
    for tok in toks:
        assert got[tok] == _soundex(tok), tok
    # and the collision query groups by exactly those keys
    rows = QUERIES["fn_soundex_collisions"](spark, SF).collect()
    per = defaultdict(set)
    for tok in toks:
        per[_soundex(tok)].add(tok)
    coll = sorted(
        ((len(v), k) for k, v in per.items() if len(v) >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert [(r.n_tokens, r.sx) for r in rows] == coll
    for r in rows:
        assert r.example_a == min(per[r.sx]) and r.example_b == max(per[r.sx])


def test_benford_second_digit_replay(spark):
    rows = {r.d2: r for r in QUERIES["agg_benford_second_digit"](spark, SF).collect()}
    assert set(rows) == set(range(10))
    vals = [
        r.o_totalprice
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    ]
    counts = defaultdict(int)
    for v in vals:
        cents = round(v * 100)
        if cents >= 10:
            counts[int(str(cents)[1])] += 1
    t = sum(counts.values())
    exp = [
        sum(math.log10(1 + 1 / (10 * d1 + d)) for d1 in range(1, 10))
        for d in range(10)
    ]
    assert abs(sum(exp) - 1) < 1e-12  # the literal table is a distribution
    for d in range(10):
        r = rows[d]
        assert r.n == counts[d]
        assert abs(r.p_obs - round(counts[d] / t, 6)) < 1e-9
        assert abs(r.p_exp - round(exp[d], 6)) < 1e-9
        z = (counts[d] / t - exp[d]) / math.sqrt(exp[d] * (1 - exp[d]) / t)
        assert abs(r.z - round(z, 6)) < 1e-4
    # Benford-2 is decreasing in the digit
    assert all(rows[d].p_exp > rows[d + 1].p_exp for d in range(9))
