"""Wave-229: varint/zigzag byte counts vs a real LEB128 encoder, Morton
codes vs a pure-python interleave, RLE runs vs itertools.groupby."""

from __future__ import annotations

from collections import defaultdict
from itertools import groupby

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _leb128_len(u: int) -> int:
    n = 1
    while u >= 0x80:
        u >>= 7
        n += 1
    return n


def test_zigzag_varint_matches_real_encoder(spark):
    rows = {r.l_returnflag: r for r in QUERIES["fn_zigzag_varint"](spark, SF).collect()}
    li = (
        table(spark, SF, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .collect()
    )
    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append((r.l_orderkey, r.l_linenumber))
    for flag, keys in groups.items():
        keys.sort()
        total = 0
        prev = None
        for k, _ in keys:
            d = k if prev is None else k - prev
            z = (d << 1) ^ (d >> 63)
            total += _leb128_len(z)
            prev = k
        got = rows[flag]
        assert got.n_values == len(keys)
        assert got.varint_bytes == total
        assert got.raw_bytes == 8 * len(keys)
        assert abs(got.compression_ratio - total / (8 * len(keys))) < 1e-6
        # the clustered key should compress hard: way under 8 bytes/value
        assert got.avg_bits_per_value < 24


def _interleave(x: int, y: int) -> int:
    m = 0
    for b in range(16):
        m |= ((x >> b) & 1) << (2 * b)
        m |= ((y >> b) & 1) << (2 * b + 1)
    return m


def test_morton_matches_bitwise_reference(spark):
    rows = QUERIES["fn_morton_interleave"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.x == r.c_custkey % 65536
        assert r.y == (r.c_custkey * 2654435761) % 65536
        assert r.morton == _interleave(r.x, r.y)
        assert r.roundtrip_ok
    # Z-curve locality sanity: codes are distinct per point
    assert len({r.morton for r in rows}) == len(rows)


def test_rle_audit_matches_groupby(spark):
    rows = {
        r.l_returnflag: r
        for r in QUERIES["scan_rle_delta_audit"](spark, SF).collect()
    }
    li = table(spark, SF, "lineitem").select("l_returnflag", "l_shipdate").collect()
    groups = defaultdict(list)
    for r in li:
        groups[r.l_returnflag].append(r.l_shipdate)
    for flag, dates in groups.items():
        dates.sort()
        runs = [len(list(g)) for _, g in groupby(dates)]
        deltas = {
            (b - a).days for a, b in zip(dates, dates[1:])
        }
        got = rows[flag]
        assert got.n_values == len(dates)
        assert got.n_runs == len(runs)
        assert abs(got.avg_run_len - len(dates) / len(runs)) < 1e-6
        # audit counts the LAG-NULL first delta as NULL (excluded), so the
        # distinct-delta alphabet is over consecutive pairs only
        assert got.n_distinct_deltas == len(deltas)
        assert got.max_day_gap == max(deltas)
