"""Wave-294: Kuiper vs a raw-row python replay; Siegel-Tukey's closed-form
end-alternating ranks vs an independent simulation of the actual dealing
procedure."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kuiper_matches_rawrow_replay(spark):
    row = QUERIES["agg_kuiper_test"](spark, SF).first()
    us = sorted(
        (int(r["mu"]) / 86400000000.0)
        for r in table(spark, SF, "events")
        .selectExpr("unix_micros(ts) % 86400000000 AS mu")
        .collect()
    )
    n = len(us)
    d_plus = max((i + 1) / n - u for i, u in enumerate(us))
    d_minus = max(u - i / n for i, u in enumerate(us))
    assert row["n_obs"] == n
    assert abs(row["d_plus"] - d_plus) < 1e-6
    assert abs(row["d_minus"] - d_minus) < 1e-6
    assert abs(row["kuiper_v"] - (d_plus + d_minus)) < 1e-6
    # V* adjustment and the published 5% point
    vstar = (d_plus + d_minus) * (n**0.5 + 0.155 + 0.24 / n**0.5)
    assert abs(row["v_star"] - vstar) < 1e-5
    assert row["nonuniform"] == (vstar > 1.747)
    # Kuiper dominates each one-sided KS arm
    assert row["kuiper_v"] >= max(row["d_plus"], row["d_minus"]) - 1e-9


def _deal_siegel_tukey(n: int) -> list[int]:
    """Simulate the actual 1960 dealing: 1 to the lowest, 2,3 to the two
    highest, 4,5 to the next two lowest, ... (independent of the closed
    form used in the query)."""
    ranks = [0] * n
    lo, hi = 0, n - 1
    r = 1
    take_low, burst = True, 1  # first burst is a single low card
    while lo <= hi:
        for _ in range(burst):
            if lo > hi:
                break
            if take_low:
                ranks[lo] = r
                lo += 1
            else:
                ranks[hi] = r
                hi += 1 - 2  # hi -= 1
            r += 1
        take_low = not take_low
        burst = 2
    return ranks


def test_siegel_tukey_ranks_match_dealing_simulation(spark):
    row = QUERIES["agg_siegel_tukey"](spark, SF).first()
    vals = sorted(
        (int(round(r["o_totalprice"] * 100)), r["o_orderkey"], r["o_orderpriority"])
        for r in table(spark, SF, "orders")
        .where("o_orderpriority IN ('1-URGENT', '5-LOW')")
        .collect()
    )
    n = len(vals)
    ranks = _deal_siegel_tukey(n)
    assert sorted(ranks) == list(range(1, n + 1))  # a permutation of 1..n
    w1 = sum(r for r, (_, _, g) in zip(ranks, vals) if g == "1-URGENT")
    n1 = sum(1 for *_x, g in vals if g == "1-URGENT")
    n2 = n - n1
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["rank_sum_urgent"] == w1
    z = (w1 - n1 * (n + 1) / 2) / ((n1 * n2 * (n + 1) / 12) ** 0.5)
    assert abs(row["z_dispersion"] - z) < 1e-6
    assert row["unequal_spread"] == (abs(z) > 1.959964)
