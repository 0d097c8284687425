"""Wave-336: Black-Scholes vs math.erf closed form; Jaro-Winkler python
implementation vs DuckDB's native on canonical + fixture cases."""

from __future__ import annotations

import math

import duckdb

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.operators.wave336 import (
    _jaro,
    _jaro_winkler,
)
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _phi(x):
    return 0.5 * math.erfc(-x / math.sqrt(2))


def test_black_scholes_vs_erf_closed_form(spark):
    rows = QUERIES["fn_black_scholes"](spark, SF).collect()
    assert rows
    for r in rows:
        s, k, sg, t = r["spot"], r["strike"], r["sigma"], r["maturity"]
        d1 = (math.log(s / k) + (0.03 + sg * sg / 2) * t) / (
            sg * math.sqrt(t)
        )
        d2 = d1 - sg * math.sqrt(t)
        call = s * _phi(d1) - k * math.exp(-0.03 * t) * _phi(d2)
        put = k * math.exp(-0.03 * t) * _phi(-d2) - s * _phi(-d1)
        # A&S polynomial |eps| < 1.5e-7 -> price error < ~2e-4 * S
        assert abs(r["call_price"] - call) < 3e-4 * max(s, k)
        assert abs(r["put_price"] - put) < 3e-4 * max(s, k)
        assert abs(r["call_delta"] - _phi(d1)) < 1e-5
        assert r["parity_residual"] < 1e-5
        # no-arbitrage bounds
        assert r["call_price"] >= max(0.0, s - k * math.exp(-0.03 * t)) - 1e-4
        assert r["put_price"] >= max(0.0, k * math.exp(-0.03 * t) - s) - 1e-4


def test_jaro_winkler_python_vs_duckdb():
    cases = [
        ("MARTHA", "MARHTA"),
        ("DIXON", "DICKSONX"),
        ("DWAYNE", "DUANE"),
        ("JELLYFISH", "SMELLYFISH"),
        ("abc", "abc"),
        ("abc", "xyz"),
        ("a", "ab"),
        ("CRATE", "TRACE"),
        ("cold widget", "small widget"),
        ("prefix match", "prefix natch"),
        ("ab", "ba"),
    ]
    con = duckdb.connect()
    for a, b in cases:
        ja, jw = con.execute(
            "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
            [a, b, a, b],
        ).fetchone()
        assert abs(_jaro(a, b) - ja) < 1e-12, (a, b)
        assert abs(_jaro_winkler(a, b) - jw) < 1e-12, (a, b)
    assert abs(_jaro("MARTHA", "MARHTA") - 0.944444444444) < 1e-9
    assert abs(_jaro_winkler("MARTHA", "MARHTA") - 0.961111111111) < 1e-9


def test_jaro_winkler_query_rows(spark):
    rows = QUERIES["fn_jaro_winkler"](spark, SF).collect()
    assert rows
    names = {
        r["p_partkey"]: r["p_name"]
        for r in table(spark, SF, "part").collect()
    }
    for r in rows:
        a, b = names[r["k1"]], names[r["k2"]]
        assert abs(r["jaro"] - _jaro(a, b)) < 1e-6
        assert abs(r["jaro_winkler"] - _jaro_winkler(a, b)) < 1e-6
        assert r["match_085"] == (_jaro_winkler(a, b) >= 0.85)
        assert r["jaro_winkler"] >= r["jaro"] - 1e-9
