"""Wave-343: MUS vs a python systematic-point walk; CORDIC vs
math.sin/cos with the 16-step resolution bound."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.operators.wave343 import (
    _ATANS,
    _K,
    _N_SAMPLES,
    _SCALE,
)
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_monetary_unit_sampling_replay(spark):
    rows = sorted(
        (
            (r["o_orderkey"], round(r["o_totalprice"] * 100))
            for r in table(spark, SF, "orders").collect()
        )
    )
    total = sum(c for _, c in rows)
    step = total // _N_SAMPLES
    points = []
    p = step // 2
    while p <= total:
        points.append(p)
        p += step
    hits = {}
    cum = 0
    for k, c in rows:
        lo, hi = cum, cum + c
        n = sum(1 for p in points if lo < p <= hi)
        if n:
            hits[k] = (c, n)
        cum = hi
    got = {
        r["o_orderkey"]: r
        for r in QUERIES["sample_monetary_unit"](spark, SF).collect()
    }
    assert set(got) == set(hits)
    for k, (c, n) in hits.items():
        assert got[k]["n_hits"] == n
        assert abs(got[k]["amount"] - c / 100) < 1e-9
        assert got[k]["top_stratum"] == (c > step)
        assert abs(got[k]["expected_hits"] - c / step) < 1e-6
    # every sampling point lands exactly once
    assert sum(n for _, n in hits.values()) == len(points)


def _cordic(z_u):
    x, y, z = _K, 0, z_u
    for i in range(16):
        shx = math.floor(x / (1 << i))
        shy = math.floor(y / (1 << i))
        if z >= 0:
            x, y, z = x - shy, y + shx, z - _ATANS[i]
        else:
            x, y, z = x + shy, y - shx, z + _ATANS[i]
    return x, y


def test_cordic_matches_fixed_point_replay(spark):
    rows = QUERIES["fn_cordic_sincos"](spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        z_u = r["id"] * 60000
        x, y = _cordic(z_u)
        assert r["cos_fixed"] == x
        assert r["sin_fixed"] == y
        theta = z_u / _SCALE
        # 16-iteration CORDIC resolution ~ atan(2^-15) + fixed-point noise
        assert abs(r["cordic_sin"] - math.sin(theta)) < 1e-4
        assert abs(r["cordic_cos"] - math.cos(theta)) < 1e-4
        assert r["sin_abs_err"] < 1e-4 and r["cos_abs_err"] < 1e-4
        # unit circle preserved up to the gain-corrected norm
        norm = math.hypot(r["cordic_sin"], r["cordic_cos"])
        assert abs(norm - 1.0) < 1e-3
