"""Wave-293: Hamming(7,4) vs a python bit replay INCLUDING exhaustive
verification over the whole 16 x 7 code/flip space, medcouple vs a
pairwise replay plus the sign coherence with Bowley skewness."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _encode(nib):
    d1, d2, d3, d4 = (nib >> 3) & 1, (nib >> 2) & 1, (nib >> 1) & 1, nib & 1
    p1 = (d1 + d2 + d4) % 2
    p2 = (d1 + d3 + d4) % 2
    p3 = (d2 + d3 + d4) % 2
    return [p1, p2, d1, p3, d2, d3, d4]


def _decode(bits):
    s1 = (bits[0] + bits[2] + bits[4] + bits[6]) % 2
    s2 = (bits[1] + bits[2] + bits[5] + bits[6]) % 2
    s3 = (bits[3] + bits[4] + bits[5] + bits[6]) % 2
    syn = s1 + 2 * s2 + 4 * s3
    fixed = list(bits)
    if syn:
        fixed[syn - 1] ^= 1
    return syn, 8 * fixed[2] + 4 * fixed[4] + 2 * fixed[5] + fixed[6]


def test_hamming_replay(spark):
    row = QUERIES["fn_hamming_code"](spark, SF).collect()[0]
    uids = {
        r.user_id
        for r in table(spark, SF, "events").select("user_id").collect()
    }
    corrected = located = 0
    for u in uids:
        nib = u % 16
        flip = 1 + int(hashlib.md5(f"hb:{u}".encode()).hexdigest()[:8], 16) % 7
        bits = _encode(nib)
        bits[flip - 1] ^= 1
        syn, dec = _decode(bits)
        corrected += dec == nib
        located += syn == flip
    assert row.n_codewords == len(uids)
    assert row.n_corrected == corrected == len(uids)
    assert row.n_syndrome_located == located == len(uids)
    assert bool(row.all_recovered)
    # exhaustive proof over the full code x error space
    for nib in range(16):
        for flip in range(1, 8):
            bits = _encode(nib)
            bits[flip - 1] ^= 1
            syn, dec = _decode(bits)
            assert syn == flip and dec == nib


def test_medcouple_replay(spark):
    row = QUERIES["agg_medcouple"](spark, SF).collect()[0]
    ev = table(spark, SF, "events").selectExpr("CAST(ts AS DATE) AS d", "value").collect()
    per = defaultdict(list)
    for r in ev:
        per[r.d].append(r.value)
    ys = sorted(sum(v) / len(v) for _, v in sorted(per.items()))
    n = len(ys)
    m = ys[math.ceil(n * 0.5) - 1]
    lo = [y for y in ys if y <= m]
    hi = [y for y in ys if y >= m]
    ks = sorted(
        ((h - m) - (m - l)) / (h - l)
        for l in lo
        for h in hi
        if h > l
    )
    mc = ks[math.ceil(len(ks) * 0.5) - 1]
    assert row.n_pairs == len(ks)
    assert abs(row.median - round(m, 6)) < 1e-9
    assert abs(row.medcouple - round(mc, 6)) < 1e-9
    assert -1 <= row.medcouple <= 1
    # sign coherence with Bowley's quartile skewness
    q1 = ys[math.ceil(n * 0.25) - 1]
    q3 = ys[math.ceil(n * 0.75) - 1]
    bowley = (q3 + q1 - 2 * m) / (q3 - q1)
    if abs(bowley) > 0.15:
        assert (row.medcouple > 0) == (bowley > 0)
