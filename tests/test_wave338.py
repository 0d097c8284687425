"""Wave-338: effect sizes vs closed forms; life table vs a python
cohort walk; visibility graph vs a brute-force line check."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_effect_sizes_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS g",
        "CAST(ROUND(value*100) AS LONG) AS y",
    ).collect()
    g1 = [r["y"] / 100 for r in rows if r["g"]]
    g0 = [r["y"] / 100 for r in rows if not r["g"]]
    n1, n0 = len(g1), len(g0)
    m1, m0 = sum(g1) / n1, sum(g0) / n0
    ss1 = sum((x - m1) ** 2 for x in g1)
    ss0 = sum((x - m0) ** 2 for x in g0)
    d = (m1 - m0) / math.sqrt((ss1 + ss0) / (n1 + n0 - 2))
    j = 1 - 3 / (4 * (n1 + n0 - 2) - 1)
    glass = (m1 - m0) / math.sqrt(ss0 / (n0 - 1))
    cles = 0.5 * math.erfc(-(d / math.sqrt(2)) / math.sqrt(2))
    row = QUERIES["agg_cohens_d_effect_sizes"](spark, SF).first()
    assert row["n_obs"] == n1 + n0
    assert abs(row["cohens_d"] - d) < 1e-5
    assert abs(row["hedges_g"] - j * d) < 1e-5
    assert abs(row["glass_delta"] - glass) < 1e-5
    assert abs(row["cles"] - cles) < 1e-5
    # |g| < |d| (correction shrinks)
    assert abs(row["hedges_g"]) <= abs(row["cohens_d"]) + 1e-12


def test_life_table_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id", "CAST(ts AS DATE) AS d"
    ).collect()
    span = {}
    for r in rows:
        lo, hi = span.get(r["user_id"], (r["d"], r["d"]))
        span[r["user_id"]] = (min(lo, r["d"]), max(hi, r["d"]))
    deaths = {}
    for lo, hi in span.values():
        b = (hi - lo).days // 6
        deaths[b] = deaths.get(b, 0) + 1
    got = {r["band"]: r for r in QUERIES["events_life_table"](spark, SF).collect()}
    assert len(got) == 5
    total = len(span)
    lx = 100000.0
    llx = []
    qs = []
    entering = total
    for b in range(5):
        dx = deaths.get(b, 0)
        row = got[b]
        assert row["deaths"] == dx
        assert row["n_entering"] == entering
        q = dx / entering if entering else 0.0
        qs.append(q)
        assert abs(row["qx"] - q) < 1e-6
        assert abs(row["lx"] - lx) < 0.02
        llx.append((lx, q))
        entering -= dx
        lx = lx * (1 - q)
    # ex at band 0 = sum of trapezoid person-bands / l0
    ls = [100000.0]
    for q in qs:
        ls.append(ls[-1] * (1 - q))
    bigl = [(ls[b] + ls[b + 1]) / 2 for b in range(5)]
    # terminal band: lead is l5 = 0 when q4 = 1
    ex0 = sum(bigl) / ls[0]
    assert abs(got[0]["ex_bands"] - ex0) < 1e-4
    assert got[4]["qx"] == 1.0  # everyone dies in the terminal band


def test_visibility_graph_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CAST(ts AS DATE) AS d", "CAST(ROUND(value*100) AS LONG) AS p"
    ).collect()
    agg = {}
    for r in rows:
        n, s = agg.get(r["d"], (0, 0))
        agg[r["d"]] = (n + 1, s + r["p"])
    days = sorted(agg)
    m = [agg[d][1] / 100.0 / agg[d][0] for d in days]
    n = len(m)
    edges = set()
    for i in range(n):
        for j in range(i + 1, n):
            if all(
                m[k] < m[i] + (m[j] - m[i]) * (k - i) / (j - i)
                for k in range(i + 1, j)
            ):
                edges.add((i + 1, j + 1))
    deg = {}
    for i, j in edges:
        deg[i] = deg.get(i, 0) + 1
        deg[j] = deg.get(j, 0) + 1
    got = {
        r["day_idx"]: r
        for r in QUERIES["events_visibility_graph"](spark, SF).collect()
    }
    assert set(got) == set(deg)
    for i, r in got.items():
        assert r["degree"] == deg[i]
        assert r["n_edges"] == len(edges)
    # adjacent days always see each other
    assert all((i, i + 1) in edges for i in range(1, n))
