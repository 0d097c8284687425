"""Wave-330: Stouffer/Fisher combination vs math.erfc + exact chi2
survival; Page's L and Kendall's W vs python rank replays."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_combine_pvalues_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "event_type", "CAST(ROUND(value*100) AS LONG) AS y"
    ).collect()
    ys = [r["y"] for r in rows]
    n = len(ys)
    mu = sum(ys) / n
    sd = math.sqrt(sum(y * y for y in ys) / n - mu * mu)
    grp = {}
    for r in rows:
        grp.setdefault(r["event_type"], []).append(r["y"])
    zs, ps = [], []
    for t in sorted(grp):
        g = grp[t]
        zg = (sum(g) / len(g) - mu) / (sd / math.sqrt(len(g)))
        zs.append(zg)
        ps.append(math.erfc(abs(zg) / math.sqrt(2)))
    k = len(zs)
    z_st = sum(zs) / math.sqrt(k)
    x2 = -2 * sum(math.log(p) for p in ps)
    # chi2(2k) survival, even dof closed form
    h = x2 / 2
    sf = math.exp(-h) * sum(h**j / math.factorial(j) for j in range(k))
    row = QUERIES["agg_combine_pvalues"](spark, SF).first()
    assert row["k"] == k
    assert abs(row["stouffer_z"] - z_st) < 1e-5
    # A&S polynomial has |eps| < 1.5e-7 vs true erfc
    assert abs(row["stouffer_p"] - math.erfc(abs(z_st) / math.sqrt(2))) < 1e-5
    assert abs(row["fisher_chi2"] - x2) < 1e-3
    assert abs(row["fisher_p"] - sf) < 1e-4
    assert 0 <= row["stouffer_p"] <= 1 and 0 <= row["fisher_p"] <= 1


def test_stuart_maxwell_replay(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id",
        "CASE WHEN event_type = 'purchase' THEN 'buy' "
        "WHEN event_type = 'error' THEN 'err' ELSE 'oth' END AS b",
        "unix_micros(ts) AS us",
        "event_id",
    ).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(
            (r["us"] * 100000000 + r["event_id"], r["b"])
        )
    cells = {}
    for seq in per_user.values():
        seq.sort()
        key = (seq[0][1], seq[-1][1])
        cells[key] = cells.get(key, 0) + 1

    def c(f, l):
        return cells.get((f, l), 0)

    r1 = c("buy", "buy") + c("buy", "err") + c("buy", "oth")
    c1 = c("buy", "buy") + c("err", "buy") + c("oth", "buy")
    r2 = c("err", "buy") + c("err", "err") + c("err", "oth")
    c2 = c("buy", "err") + c("err", "err") + c("oth", "err")
    d1, d2 = r1 - c1, r2 - c2
    s11 = r1 + c1 - 2 * c("buy", "buy")
    s22 = r2 + c2 - 2 * c("err", "err")
    s12 = -(c("buy", "err") + c("err", "buy"))
    chi2 = (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11) / (
        s11 * s22 - s12 * s12
    )
    row = QUERIES["agg_stuart_maxwell"](spark, SF).first()
    assert row["n_pairs"] == len(per_user)
    assert row["d1"] == d1 and row["d2"] == d2
    assert abs(row["sm_chi2"] - chi2) < 1e-6
    assert row["marginals_shifted"] == (chi2 > 5.991465)
    assert row["sm_chi2"] >= 0


def test_kendall_w_replay(spark):
    import pyspark.sql.functions as F

    m = (
        table(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("v"),
            F.count_distinct("user_id").alias("u"),
        )
        .collect()
    )
    types = sorted(r["event_type"] for r in m)
    by = {r["event_type"]: r for r in m}
    k = len(types)

    def rank(key):
        order = sorted(types, key=lambda t: (-by[t][key], t))
        return {t: i + 1 for i, t in enumerate(order)}

    r1, r2, r3 = rank("n"), rank("v"), rank("u")
    tot = {t: r1[t] + r2[t] + r3[t] for t in types}
    mean = 3 * (k + 1) / 2
    s = sum((tot[t] - mean) ** 2 for t in types)
    w = 12 * s / (9 * (k**3 - k))
    row = QUERIES["agg_kendall_w"](spark, SF).first()
    assert row["k"] == k and row["m_raters"] == 3
    assert abs(row["kendall_w"] - w) < 1e-6
    assert abs(row["chi2_stat"] - 3 * (k - 1) * w) < 1e-5
    assert 0 - 1e-9 <= row["kendall_w"] <= 1 + 1e-9
