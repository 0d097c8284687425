"""Wave-353: IDW and Clark-Evans vs python replays."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
QPTS = [(11, 13), (24, 31), (41, 52)]


def _stations(spark):
    sup = {
        r["s_nationkey"]: r["count"]
        for r in table(spark, SF, "supplier")
        .groupBy("s_nationkey")
        .count()
        .collect()
    }
    return [
        ((k * 7) % 50, (k * 37) % 60, sup.get(k, 0)) for k in range(25)
    ]


def test_idw_replay(spark):
    st = _stations(spark)
    got = {
        (r["qx"], r["qy"]): r
        for r in QUERIES["spatial_idw_interpolation"](spark, SF).collect()
    }
    assert set(got) == set(QPTS)
    for qx, qy in QPTS:
        exact = [z for x, y, z in st if (x - qx) ** 2 + (y - qy) ** 2 == 0]
        if exact:
            want = float(sum(exact))
        else:
            num = sum(
                z / ((x - qx) ** 2 + (y - qy) ** 2) for x, y, z in st
            )
            den = sum(
                1 / ((x - qx) ** 2 + (y - qy) ** 2) for x, y, z in st
            )
            want = num / den
        row = got[(qx, qy)]
        assert row["n_stations"] == len(st)
        assert abs(row["z_idw"] - want) < 1e-6
        # IDW stays inside the data range
        assert min(z for _, _, z in st) - 1e-9 <= row["z_idw"]
        assert row["z_idw"] <= max(z for _, _, z in st) + 1e-9


def test_clark_evans_replay(spark):
    st = _stations(spark)
    pts = [(x, y) for x, y, _ in st]
    n = len(pts)
    dbar = (
        sum(
            min(
                math.dist(p, q) for q in pts if q is not p or pts.count(p) > 1
            )
            for p in pts
        )
        / n
    )
    # careful replay matching sid-exclusion (not coordinate exclusion)
    dbar = 0.0
    for i, p in enumerate(pts):
        dbar += min(
            math.dist(p, q) for j, q in enumerate(pts) if j != i
        )
    dbar /= n
    exp = 0.5 / math.sqrt(n / 3000.0)
    se = 0.26136 / math.sqrt(n * n / 3000.0)
    row = QUERIES["spatial_clark_evans"](spark, SF).first()
    assert row["n_points"] == n
    assert abs(row["mean_nn_dist"] - dbar) < 1e-6
    assert abs(row["expected_nn_dist"] - exp) < 1e-6
    assert abs(row["clark_evans_r"] - dbar / exp) < 1e-6
    assert abs(row["z_stat"] - (dbar - exp) / se) < 1e-5
    assert row["dispersed"] == (dbar / exp > 1.0)
