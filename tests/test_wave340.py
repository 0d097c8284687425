"""Wave-340: Breslow-Day vs a python quadratic-root replay; weighted
kappa vs direct contingency math; BWS vs a sorted-rank walk."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_breslow_day_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "dayofweek(CAST(ts AS DATE)) + 1 AS s",
        "CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS e",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS o",
    ).collect()
    strata = {}
    for r in rows:
        t = strata.setdefault(r["s"], [0, 0, 0, 0])
        t[(1 - r["e"]) * 2 + (1 - r["o"])] += 1  # a,b,c,d order
    # a=e&o, b=e&!o, c=!e&o, d=!e&!o
    cells = {
        s: (t[0], t[1], t[2], t[3]) for s, t in strata.items()
    }
    r_num = sum(a * d / (a + b + c + d) for a, b, c, d in cells.values())
    r_den = sum(b * c / (a + b + c + d) for a, b, c, d in cells.values())
    R = r_num / r_den
    bd = sd = sv = 0.0
    for a, b, c, d in cells.values():
        n1, n0, m1 = a + b, c + d, a + c
        qa, qb, qc = 1 - R, (n0 - m1) + R * (n1 + m1), -R * n1 * m1
        disc = math.sqrt(qb * qb - 4 * qa * qc)
        r1 = (-qb + disc) / (2 * qa)
        r2 = (-qb - disc) / (2 * qa)
        lo, hi = max(0.0, m1 - n0), min(n1, m1)
        ahat = r1 if lo - 1e-9 <= r1 <= hi + 1e-9 else r2
        v = 1.0 / (
            1 / ahat + 1 / (n1 - ahat) + 1 / (m1 - ahat) + 1 / (n0 - m1 + ahat)
        )
        bd += (a - ahat) ** 2 / v
        sd += a - ahat
        sv += v
    row = QUERIES["agg_breslow_day"](spark, SF).first()
    assert row["n_strata"] == len(cells)
    assert abs(row["or_mh"] - R) < 1e-5
    assert abs(row["bd_chi2"] - bd) < 1e-4
    assert abs(row["tarone_chi2"] - (bd - sd * sd / sv)) < 1e-4
    # Tarone correction only ever lowers the statistic
    assert row["tarone_chi2"] <= row["bd_chi2"] + 1e-9


def test_weighted_kappa_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id",
        "LEAST(4, CAST(FLOOR(value / 40) AS LONG)) AS b",
        "unix_micros(ts) AS us",
        "event_id",
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r["user_id"], []).append((r["us"] * 100000000 + r["event_id"], r["b"]))
    cells = {}
    for seq in per.values():
        seq.sort()
        key = (seq[0][1], seq[-1][1])
        cells[key] = cells.get(key, 0) + 1
    n = sum(cells.values())
    rm, cm = {}, {}
    for (i, j), c in cells.items():
        rm[i] = rm.get(i, 0) + c
        cm[j] = cm.get(j, 0) + c
    for name, w in (("kappa_linear", 1), ("kappa_quadratic", 2)):
        d_obs = sum(abs(i - j) ** w * c for (i, j), c in cells.items())
        d_exp = sum(
            abs(i - j) ** w * rm[i] * cm[j]
            for i in rm
            for j in cm
        )
        kappa = 1 - d_obs * n / d_exp
        row = QUERIES["agg_weighted_kappa"](spark, SF).first()
        assert row["n_pairs"] == n
        assert abs(row[name] - kappa) < 1e-6


def test_bws_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS g",
        "CAST(ROUND(value*100) AS LONG) AS v",
        "unix_micros(ts) AS us",
        "event_id",
    ).collect()
    seq = sorted(rows, key=lambda r: (r["v"], r["us"] * 100000000 + r["event_id"]))
    nn = len(seq)
    nx = sum(1 for r in seq if r["g"])
    ny = nn - nx
    bx = by = 0.0
    ix = iy = 0
    for pos, r in enumerate(seq, start=1):
        if r["g"]:
            ix += 1
            e = (nn + 1) / (nx + 1) * ix
            den = (ix / (nx + 1)) * (1 - ix / (nx + 1)) * (ny * (nn + 1) / (nx + 1))
            bx += math.floor(1e9 * (pos - e) ** 2 / den) / 1e9
        else:
            iy += 1
            e = (nn + 1) / (ny + 1) * iy
            den = (iy / (ny + 1)) * (1 - iy / (ny + 1)) * (nx * (nn + 1) / (ny + 1))
            by += math.floor(1e9 * (pos - e) ** 2 / den) / 1e9
    bx /= nx
    by /= ny
    row = QUERIES["agg_bws_test"](spark, SF).first()
    assert row["n_weekend"] == nx and row["n_weekday"] == ny
    assert abs(row["b_x"] - bx) < 1e-5
    assert abs(row["b_y"] - by) < 1e-5
    assert abs(row["bws_b"] - (bx + by) / 2) < 1e-5
    assert row["bws_b"] > 0
