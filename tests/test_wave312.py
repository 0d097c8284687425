"""Wave-312: DDSketch vs a python bucket replay, plus the paper's
relative-error guarantee verified at every probed quantile."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
ALPHA = 0.01
GAMMA = (1 + ALPHA) / (1 - ALPHA)


def test_ddsketch_matches_bucket_replay_and_guarantee(spark):
    row = QUERIES["agg_ddsketch_quantiles"](spark, SF).first()
    vs = sorted(
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    )
    n = len(vs)
    buckets = {}
    for v in vs:
        b = math.ceil(math.log(v) / math.log(GAMMA))
        buckets[b] = buckets.get(b, 0) + 1
    assert row["n_obs"] == n
    assert row["n_buckets"] == len(buckets)

    def sketch_q(q):
        r = math.ceil(q * n)
        c = 0
        for b in sorted(buckets):
            c += buckets[b]
            if c >= r:
                return 2 * GAMMA**b / (GAMMA + 1)
        raise AssertionError

    for q, col in ((0.50, "p50_estimate"), (0.95, "p95_estimate"), (0.99, "p99_estimate")):
        est = sketch_q(q) / 100
        assert abs(row[col] - est) < 0.02, (q, row[col], est)
        # the DDSketch guarantee: relative error <= alpha vs the exact
        # order statistic at rank ceil(q n)
        exact = vs[math.ceil(q * n) - 1] / 100
        assert abs(est - exact) / exact <= ALPHA + 1e-9
    assert abs(row["p95_exact"] - vs[math.ceil(0.95 * n) - 1] / 100) < 0.011
    assert row["p95_within_alpha"]
