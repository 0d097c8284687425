"""Wave-169: KN probability identities, Witten-Bell mass bounds, Burrows
Delta metric properties."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_kneser_ney_probabilities_valid(spark):
    rows = QUERIES["text_kneser_ney_bigram"](spark, SF).collect()
    assert len(rows) == 20
    prev = None
    for r in rows:
        assert 0 < r["p_kn"] <= 1.0
        assert r["c"] >= 1
        if prev is not None:
            assert r["p_kn"] <= prev  # emitted in rank order
        prev = r["p_kn"]


def test_witten_bell_mass_bounds(spark):
    rows = QUERIES["text_witten_bell_mass"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["unseen_mass"] < 1
        assert r["n_types"] <= r["n_tokens"]
        # identity: lambda = T/(T+N)
        lam = r["n_types"] / (r["n_types"] + r["n_tokens"])
        assert abs(r["unseen_mass"] - lam) < 1e-6


def test_burrows_delta_metric_properties(spark):
    rows = QUERIES["text_burrows_delta"](spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert (r["source_a"], r["source_b"]) not in seen
        seen.add((r["source_a"], r["source_b"]))
        assert r["delta"] >= 0  # mean absolute z difference
    srcs = {s for p in seen for s in p}
    assert len(seen) == len(srcs) * (len(srcs) - 1) // 2  # all pairs present
