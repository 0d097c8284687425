"""Wave-316: bunching counts vs a residue replay; price dispersion vs a
per-part replay."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_bunching_matches_residue_replay(spark):
    row = QUERIES["agg_round_number_bunching"](spark, SF).first()
    cents = [
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    ]
    n = len(cents)
    at100 = sum(1 for c in cents if c % 10000 == 0)
    whole = sum(1 for c in cents if c % 100 == 0)
    e99 = sum(1 for c in cents if (c // 100) % 100 == 99)
    assert row["n_obs"] == n
    assert (row["at_100s"], row["whole_dollars"], row["ending_99"]) == (
        at100,
        whole,
        e99,
    )
    assert abs(row["excess_100s"] - at100 * 10000 / n) < 1e-4
    assert abs(row["excess_whole"] - whole * 100 / n) < 1e-4
    assert abs(row["excess_99"] - e99 * 100 / n) < 1e-4
    z = (at100 - n / 10000) / math.sqrt(n / 10000 * (1 - 1 / 10000))
    assert abs(row["z_100s"] - z) < 1e-4
    assert row["bunched_at_100s"] == (abs(z) > 1.959964)
    # containment: $100 multiples are whole dollars
    assert row["at_100s"] <= row["whole_dollars"]


def test_price_dispersion_matches_part_replay(spark):
    row = QUERIES["warehouse_price_dispersion"](spark, SF).first()
    per = defaultdict(list)
    for r in table(spark, SF, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    ).collect():
        per[r["l_partkey"]].append(
            int(round(r["l_extendedprice"] / r["l_quantity"] * 100))
        )
    cvs, rrs = [], []
    for ps in per.values():
        if len(ps) < 2:
            continue
        m = sum(ps) / len(ps)
        var = max(sum(p * p for p in ps) / len(ps) - m * m, 0)
        cvs.append(math.sqrt(var) / m)
        rrs.append((max(ps) - min(ps)) / ((max(ps) + min(ps)) / 2))
    assert row["n_parts_multi"] == len(cvs)
    assert abs(row["mean_cv"] - sum(cvs) / len(cvs)) < 1e-5
    assert abs(row["max_cv"] - max(cvs)) < 1e-5
    assert abs(row["mean_rel_range"] - sum(rrs) / len(rrs)) < 1e-5
    assert abs(
        row["frac_dispersed"] - sum(1 for c in cvs if c > 0.1) / len(cvs)
    ) < 1e-6
    # CV of two-or-more positive prices is bounded by sqrt(n-1) <= range
    assert 0 <= row["mean_cv"] <= row["mean_rel_range"] + 1
