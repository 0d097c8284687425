"""Wave-234: Moran's I and Getis-Ord Gi* vs a pure-python ESDA replay on
the same 24x7 grid (no scipy — closed-form normality moments)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _grid(spark):
    ev = table(spark, SF, "events").selectExpr(
        "hour(ts) AS h", "dayofweek(ts) AS d", "value"
    ).collect()
    acc = defaultdict(lambda: [0, 0.0])
    for r in ev:
        acc[(r.h, r.d)][0] += 1
        acc[(r.h, r.d)][1] += r.value
    return {k: s / n for k, (n, s) in acc.items()}


def _neighbors(cells, k, include_self):
    h, d = k
    out = []
    for kk in cells:
        if abs(kk[0] - h) <= 1 and abs(kk[1] - d) <= 1:
            if kk == k and not include_self:
                continue
            out.append(kk)
    return out


def test_moran_i_replay(spark):
    row = QUERIES["agg_moran_i"](spark, SF).collect()[0]
    cells = _grid(spark)
    n = len(cells)
    xbar = sum(cells.values()) / n
    dev = {k: v - xbar for k, v in cells.items()}
    num = s0 = 0.0
    deg = {}
    for k in cells:
        nb = _neighbors(cells, k, include_self=False)
        deg[k] = len(nb)
        s0 += len(nb)
        num += sum(dev[k] * dev[j] for j in nb)
    den = sum(v * v for v in dev.values())
    i_stat = (n / s0) * (num / den)
    e_i = -1.0 / (n - 1)
    s1, s2 = 2 * s0, 4 * sum(v * v for v in deg.values())
    var = (n * n * s1 - n * s2 + 3 * s0 * s0) / ((n * n - 1) * s0 * s0) - e_i * e_i
    assert row.n_cells == n and row.s0 == int(s0)
    assert abs(row.moran_i - round(i_stat, 6)) < 1e-5
    assert abs(row.expected_i - round(e_i, 6)) < 1e-9
    assert abs(row.z_norm - round((i_stat - e_i) / math.sqrt(var), 6)) < 1e-4
    # sanity: I is bounded by roughly [-1, 1] for row-standardizable W
    assert -1.5 < row.moran_i < 1.5


def test_getis_ord_replay(spark):
    rows = {(r.h, r.d): r for r in QUERIES["agg_getis_ord_hotspots"](spark, SF).collect()}
    cells = _grid(spark)
    n = len(cells)
    assert set(rows) == set(cells)
    xbar = sum(cells.values()) / n
    s = math.sqrt(sum(v * v for v in cells.values()) / n - xbar * xbar)
    for k, r in rows.items():
        nb = _neighbors(cells, k, include_self=True)
        wi = len(nb)
        sx = sum(cells[j] for j in nb)
        z = (sx - xbar * wi) / (s * math.sqrt((n * wi - wi * wi) / (n - 1)))
        assert r.wi == wi
        assert abs(r.gi_z - round(z, 6)) < 1e-4, k
        expect = "hot" if z > 1.959964 else ("cold" if z < -1.959964 else "none")
        assert r.spot == expect, (k, z)
    # corner cells see 4 weights (incl self), interior 9
    assert min(r.wi for r in rows.values()) == 4
    assert max(r.wi for r in rows.values()) == 9
