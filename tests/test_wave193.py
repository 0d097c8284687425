"""Wave-193: Page's L vs a dict-based mid-rank replay; Lepage vs a
from-scratch rank/score recompute; Base58 vs python int encoding plus a
decode round-trip."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

_B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _midranks2(values):
    """Doubled mid-ranks of a list (exact ints)."""
    out = []
    for v in values:
        below = sum(1 for w in values if w < v)
        eq = sum(1 for w in values if w == v)
        out.append(2 * below + eq + 1)
    return out


def test_page_trend_replay(spark):
    row = QUERIES["agg_page_trend"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").select("ts").collect()
    cells = Counter()
    days = set()
    for r in ev:
        d = r["ts"].date()
        days.add(d)
        cells[(d, r["ts"].hour // 6)] += 1
    n, k = len(days), 4
    l2 = 0
    for d in sorted(days):
        vals = [cells.get((d, b), 0) for b in range(k)]
        r2 = _midranks2(vals)
        l2 += sum((b + 1) * r2[b] for b in range(k))
    mean = n * k * (k + 1) * (k + 1) / 4.0
    sd = math.sqrt(n * k * k * (k + 1) * (k * k - 1) / 144.0)
    assert row["n_blocks"] == n
    assert row["k_treatments"] == k
    assert row["l_doubled"] == l2
    assert abs(row["z_stat"] - (l2 / 2.0 - mean) / sd) < 1e-5


def test_lepage_replay(spark):
    row = QUERIES["agg_lepage"](spark, SF).collect()[0]
    ev = (
        table(spark, SF, "events")
        .where("event_type IN ('purchase', 'click')")
        .select("event_type", "value")
        .collect()
    )
    pool = [(r["value"], r["event_type"] == "purchase") for r in ev]
    vals = [v for v, _ in pool]
    r2 = _midranks2(vals)
    nn = len(pool)
    m = sum(1 for _, a in pool if a)
    w2 = sum(r for (v, a), r in zip(pool, r2) if a)
    a2 = sum(min(r, 2 * (nn + 1) - r) for (v, a), r in zip(pool, r2) if a)
    tie3 = sum(t * (t * t - 1) for t in Counter(vals).values())
    ew = m * (nn + 1) / 2.0
    vw = m * (nn - m) / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1)))
    if nn % 2 == 0:
        ea = m * (nn + 2) / 4.0
        va = m * (nn - m) * (nn + 2) * (nn - 2.0) / (48.0 * (nn - 1))
    else:
        ea = m * (nn + 1) * (nn + 1) / (4.0 * nn)
        va = m * (nn - m) * (nn + 1) * (3.0 + nn * nn) / (48.0 * nn * nn)
    zw = (w2 / 2.0 - ew) / math.sqrt(vw)
    za = (a2 / 2.0 - ea) / math.sqrt(va)
    assert row["n_a"] == m
    assert row["n_b"] == nn - m
    assert row["w_doubled"] == w2
    assert row["a_doubled"] == a2
    assert abs(row["z_wilcoxon"] - zw) < 1e-5
    assert abs(row["z_ansari"] - za) < 1e-5
    assert abs(row["lepage_d"] - (zw * zw + za * za)) < 1e-4


def test_base58_python_parity_and_roundtrip(spark):
    rows = QUERIES["fn_base58"](spark, SF).collect()
    assert len(rows) == table(spark, SF, "events").count()
    for r in rows[:200]:
        hex7 = hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:7]
        assert r["hex7"] == hex7
        v = int(hex7, 16)
        assert r["key28"] == v
        digits = []
        x = v
        for _ in range(5):
            x, d = divmod(x, 58)
            digits.append(_B58[d])
        assert r["b58"] == "".join(reversed(digits))
        # decode round-trip
        back = 0
        for ch in r["b58"]:
            back = back * 58 + _B58.index(ch)
        assert back == v
        assert len(r["b58"]) == 5
