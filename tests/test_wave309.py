"""Wave-309: variance screens vs a python group replay (plus the C/F-max
bounds); Scheffé contrasts vs direct arithmetic and its conservatism
relative to the unadjusted z test."""

from __future__ import annotations

import math
from collections import defaultdict

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _groups(spark):
    g = defaultdict(list)
    for r in table(spark, SF, "events").select("event_type", "value").collect():
        g[r["event_type"]].append(int(round(r["value"] * 1000)) / 1000)
    return g


def _var(xs):
    n = len(xs)
    m = sum(xs) / n
    return sum((x - m) ** 2 for x in xs) / (n - 1)


def test_hartley_cochran_match_group_replay(spark):
    row = QUERIES["agg_hartley_cochran"](spark, SF).first()
    g = _groups(spark)
    vs = {k: _var(xs) for k, xs in g.items()}
    assert row["k_groups"] == len(g)
    assert row["min_n"] == min(len(xs) for xs in g.values())
    assert abs(row["max_var"] - max(vs.values())) < 1e-3
    assert abs(row["min_var"] - min(vs.values())) < 1e-3
    assert abs(row["hartley_fmax"] - max(vs.values()) / min(vs.values())) < 1e-4
    assert abs(row["cochran_c"] - max(vs.values()) / sum(vs.values())) < 1e-6
    # bounds: F-max >= 1 always; C in [1/k, 1]
    assert row["hartley_fmax"] >= 1
    assert 1 / len(g) - 1e-9 <= row["cochran_c"] <= 1


def test_scheffe_matches_arithmetic_and_is_conservative(spark):
    rows = {(r["group_a"], r["group_b"]): r for r in QUERIES["agg_scheffe_contrasts"](spark, SF).collect()}
    g = _groups(spark)
    k = len(g)
    mse_num = sum((len(xs) - 1) * _var(xs) for xs in g.values())
    mse_den = sum(len(xs) - 1 for xs in g.values())
    mse = mse_num / mse_den
    names = sorted(g)
    n_pairs = 0
    for i, ga in enumerate(names):
        for gb in names[i + 1 :]:
            n_pairs += 1
            r = rows[(ga, gb)]
            ma = sum(g[ga]) / len(g[ga])
            mb = sum(g[gb]) / len(g[gb])
            half = math.sqrt(
                (k - 1) * 2.371936 * mse * (1 / len(g[ga]) + 1 / len(g[gb]))
            )
            assert abs(r["mean_diff"] - (ma - mb)) < 1e-3
            assert abs(r["scheffe_halfwidth"] - half) < 1e-4
            assert r["significant"] == (abs(ma - mb) > half)
            # conservatism: the Scheffe half-width strictly exceeds the
            # unadjusted 95% z half-width on the same standard error
            z_half = 1.959964 * math.sqrt(mse * (1 / len(g[ga]) + 1 / len(g[gb])))
            assert half > z_half
    assert len(rows) == n_pairs == k * (k - 1) // 2
