"""Wave-341: haversine/bearing vs math replays; ray casting vs
shapely-free parity walk; Hilbert curve bijection + unit-step proof."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.operators.wave341 import _POLY
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_haversine_bearing_replay(spark):
    rows = QUERIES["fn_haversine_bearing"](spark, SF).collect()
    assert len(rows) == 24

    def coords(k):
        return -60 + (k * 7) % 120, -170 + (k * 37) % 340

    for r in rows:
        la1, lo1 = (math.radians(c) for c in coords(r["id_a"]))
        la2, lo2 = (math.radians(c) for c in coords(r["id_b"]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        dist = 2 * 6371.0088 * math.asin(math.sqrt(h))
        brg = math.degrees(
            math.atan2(
                math.sin(lo2 - lo1) * math.cos(la2),
                math.cos(la1) * math.sin(la2)
                - math.sin(la1) * math.cos(la2) * math.cos(lo2 - lo1),
            )
        )
        assert abs(r["distance_km"] - dist) < 1e-5
        assert abs(r["initial_bearing_deg"] - brg) < 1e-5
        assert 0 <= r["distance_km"] <= math.pi * 6371.0088 + 1
        assert -180 - 1e-9 <= r["initial_bearing_deg"] <= 180 + 1e-9


def _inside(x, y):
    n = len(_POLY)
    c = 0
    for i in range(n):
        xi, yi = _POLY[i]
        xj, yj = _POLY[(i + 1) % n]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            c += 1
    return c


def test_point_in_polygon_replay(spark):
    rows = QUERIES["fn_point_in_polygon"](spark, SF).collect()
    assert rows
    seen_inside = seen_outside = False
    for r in rows:
        c = _inside(r["x"], r["y"])
        assert r["crossings"] == c
        assert r["inside"] == (c % 2 == 1)
        seen_inside |= r["inside"]
        seen_outside |= not r["inside"]
    assert seen_inside and seen_outside
    # centroid of the pentagon is inside; a far point is outside
    assert _inside(20, 30) % 2 == 1
    assert _inside(1000, 1000) % 2 == 0


def _xy2d(x, y):
    d = 0
    for s in (8, 4, 2, 1):
        rx = 1 if x >= s else 0
        ry = 1 if y >= s else 0
        d += s * s * ((3 * rx) ^ ry)
        if s > 1:
            xm, ym = x % s, y % s
            if ry == 0:
                if rx == 1:
                    xm, ym = s - 1 - xm, s - 1 - ym
                xm, ym = ym, xm
            x, y = xm, ym
    return d


def test_hilbert_bijection_and_unit_steps(spark):
    rows = QUERIES["fn_hilbert_curve"](spark, SF).collect()
    assert len(rows) == 256
    by_d = {}
    for r in rows:
        assert r["hilbert_d"] == _xy2d(r["x"], r["y"])
        by_d[r["hilbert_d"]] = (r["x"], r["y"])
    # bijection onto 0..255
    assert set(by_d) == set(range(256))
    # defining Hilbert property: consecutive d are grid neighbors
    for d in range(255):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d
    # curve starts at the origin cell
    assert by_d[0] == (0, 0)
