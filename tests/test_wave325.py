"""Wave-325: Kitagawa vs a stratum replay (plus the exactness identity);
location quotients vs a share replay (plus the LQ weighted-mean-1
identity)."""

from __future__ import annotations

from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kitagawa_matches_stratum_replay_and_is_exact(spark):
    row = QUERIES["model_kitagawa_decomposition"](spark, SF).first()
    cells = defaultdict(lambda: [0, 0])  # (g, stratum) -> [n, s]
    for r in table(spark, SF, "events").selectExpr(
        "CASE WHEN dayofweek(ts) IN (1, 7) THEN 1 ELSE 0 END AS g",
        "CAST(FLOOR(hour(ts) / 6) AS LONG) AS st",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y",
    ).collect():
        c = cells[(r["g"], r["st"])]
        c[0] += 1
        c[1] += r["y"]
    ng = {g: sum(n for (gg, _), (n, _) in cells.items() if gg == g) for g in (0, 1)}
    strata = sorted({st for _, st in cells})
    rate_eff = comp_eff = crude1 = crude0 = 0.0
    for st in strata:
        n1, s1 = cells[(1, st)]
        n0, s0 = cells[(0, st)]
        w1, w0 = n1 / ng[1], n0 / ng[0]
        r1, r0 = s1 / n1, s0 / n0
        rate_eff += (w1 + w0) / 2 * (r1 - r0)
        comp_eff += (r1 + r0) / 2 * (w1 - w0)
        crude1 += w1 * r1
        crude0 += w0 * r0
    assert abs(row["weekend_rate"] - crude1) < 1e-6
    assert abs(row["weekday_rate"] - crude0) < 1e-6
    assert abs(row["rate_effect"] - rate_eff) < 1e-6
    assert abs(row["composition_effect"] - comp_eff) < 1e-6
    # Kitagawa's exactness: the two effects sum to the crude gap with NO
    # interaction residual (the symmetric-weights identity)
    assert abs((rate_eff + comp_eff) - (crude1 - crude0)) < 1e-12
    assert abs(row["crude_gap"] - (crude1 - crude0)) < 1e-6


def test_location_quotients_match_share_replay(spark):
    rows = {r["n_name"]: r for r in QUERIES["warehouse_location_quotient"](spark, SF).collect()}
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in table(spark, SF, "customer").select("c_custkey", "c_nationkey").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in table(spark, SF, "nation").select("n_nationkey", "n_name").collect()
    }
    cell = defaultdict(int)
    for r in table(spark, SF, "orders").select("o_custkey", "o_orderpriority").collect():
        cell[(nat[cust[r["o_custkey"]]], r["o_orderpriority"])] += 1
    regions = sorted({k[0] for k in cell})
    prios = sorted({k[1] for k in cell})
    xg = sum(cell.values())
    for reg in regions:
        xr = sum(cell[(reg, p)] for p in prios)
        lqs, gap = [], 0.0
        for p in prios:
            x = cell[(reg, p)]
            xc = sum(cell[(r2, p)] for r2 in regions)
            if x > 0:
                lqs.append((x / xr) / (xc / xg))
            gap += abs(x / xr - xc / xg)
        r = rows[reg]
        assert abs(r["max_lq"] - max(lqs)) < 1e-5
        assert abs(r["min_lq"] - min(lqs)) < 1e-5
        assert abs(r["krugman_index"] - gap / 2) < 1e-5
        # identity: the share-weighted mean LQ of a region is exactly 1,
        # so max >= 1 >= min whenever every priority is present
        assert r["max_lq"] >= 1 - 1e-9 or len(lqs) < len(prios)
        assert 0 <= r["krugman_index"] <= 1
