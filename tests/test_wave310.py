"""Wave-310: Yates unweighted-means two-way ANOVA vs a python cell
replay; effect-size ladder vs direct SS arithmetic and its ordering."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_twoway_unweighted_matches_cell_replay(spark):
    row = QUERIES["agg_anova_twoway_unweighted"](spark, SF).first()
    cells = defaultdict(list)
    for r in table(spark, SF, "events").selectExpr(
        "event_type AS a",
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS b",
        "CAST(ROUND(value*1000) AS LONG) AS m",
    ).collect():
        cells[(r["a"], r["b"])].append(r["m"] / 1000)
    m = {k: sum(v) / len(v) for k, v in cells.items()}
    n = {k: len(v) for k, v in cells.items()}
    alev = sorted({a for a, _ in cells})
    blev = sorted({b for _, b in cells})
    ka, kb = len(alev), len(blev)
    ntot = sum(n.values())
    nh = len(cells) / sum(1 / x for x in n.values())
    grand = sum(m.values()) / len(m)
    am = {a: sum(m[(a, b)] for b in blev) / kb for a in alev}
    bm = {b: sum(m[(a, b)] for a in alev) / ka for b in blev}
    ssa = nh * kb * sum((am[a] - grand) ** 2 for a in alev)
    ssb = nh * ka * sum((bm[b] - grand) ** 2 for b in blev)
    ssab = nh * sum(
        (m[(a, b)] - am[a] - bm[b] + grand) ** 2 for a in alev for b in blev
    )
    sse = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in cells.values()
    )
    mse = sse / (ntot - ka * kb)
    assert row["levels_a"] == ka and row["levels_b"] == kb
    assert row["n_obs"] == ntot
    assert abs(row["harmonic_cell_n"] - nh) < 1e-4
    assert abs(row["f_a"] - ssa / (ka - 1) / mse) < 1e-3
    assert abs(row["f_b"] - ssb / (kb - 1) / mse) < 1e-3
    assert abs(row["f_interaction"] - ssab / ((ka - 1) * (kb - 1)) / mse) < 1e-3
    assert row["sig_a"] == (ssa / (ka - 1) / mse > 2.371936)
    assert row["sig_b"] == (ssb / (kb - 1) / mse > 3.841459)


def test_effect_size_ladder_and_ordering(spark):
    row = QUERIES["agg_anova_effect_sizes"](spark, SF).first()
    groups = defaultdict(list)
    for r in table(spark, SF, "events").selectExpr(
        "event_type", "CAST(ROUND(value*1000) AS LONG) AS m"
    ).collect():
        groups[r["event_type"]].append(r["m"] / 1000)
    allv = [x for v in groups.values() for x in v]
    nt, k = len(allv), len(groups)
    grand = sum(allv) / nt
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    sst = sum((x - grand) ** 2 for x in allv)
    mse = (sst - ssb) / (nt - k)
    eta2 = ssb / sst
    omega2 = (ssb - (k - 1) * mse) / (sst + mse)
    eps2 = (ssb - (k - 1) * mse) / sst
    f = (ssb / (k - 1)) / mse
    assert row["n_obs"] == nt and row["k_groups"] == k
    assert abs(row["eta_squared"] - eta2) < 1e-5
    assert abs(row["omega_squared"] - omega2) < 1e-5
    assert abs(row["epsilon_squared"] - eps2) < 1e-5
    assert abs(row["f_stat"] - f) < 1e-3
    # the textbook bias ordering: eta2 never understates, and omega2's
    # larger denominator pulls the estimate toward zero FROM EITHER SIDE
    # (this fixture's effect is ~0 and the unbiased estimates go slightly
    # negative, so the naive eta >= eps >= omega chain only holds for the
    # first link plus the magnitude link)
    assert row["eta_squared"] >= row["epsilon_squared"]
    assert abs(row["omega_squared"]) <= abs(row["epsilon_squared"]) + 1e-9
    assert (row["omega_squared"] >= 0) == (row["epsilon_squared"] >= 0)
