"""Wave-296: D'Agostino K² vs an independent scipy-free python replay of
the published transforms; LIX/RIX vs per-doc python token counting."""

from __future__ import annotations

import math

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_dagostino_k2_matches_published_transforms(spark):
    row = QUERIES["agg_dagostino_k2"](spark, SF).first()
    cs = [
        int(round(r["o_totalprice"] * 100))
        for r in table(spark, SF, "orders").select("o_totalprice").collect()
    ]
    n = len(cs)
    mu = sum(cs) / n
    m2 = sum((c - mu) ** 2 for c in cs) / n
    m3 = sum((c - mu) ** 3 for c in cs) / n
    m4 = sum((c - mu) ** 4 for c in cs) / n
    g1 = m3 / m2**1.5
    b2 = m4 / m2**2
    assert row["n_obs"] == n
    assert abs(row["skewness_g1"] - g1) < 1e-4
    assert abs(row["kurtosis_b2"] - b2) < 1e-4
    # z1: D'Agostino 1970
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    beta2 = (
        3 * (n**2 + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (beta2 - 1)) - 1
    delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2 / (w2 - 1))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    # z2: Anscombe-Glynn 1983
    eb2 = 3 * (n - 1) / (n + 1)
    vb2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    x = (b2 - eb2) / math.sqrt(vb2)
    sb = (
        6 * (n**2 - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    a = 6 + 8 / sb * (2 / sb + math.sqrt(1 + 4 / sb**2))
    inner = (1 - 2 / a) / (1 + x * math.sqrt(2 / (a - 4)))
    z2 = ((1 - 2 / (9 * a)) - math.copysign(abs(inner) ** (1 / 3), inner)) / math.sqrt(
        2 / (9 * a)
    )
    assert abs(row["z_skew"] - z1) < 1e-4
    assert abs(row["z_kurt"] - z2) < 1e-4
    k2 = z1 * z1 + z2 * z2
    assert abs(row["k2_statistic"] - k2) < 1e-3
    assert row["reject_normal"] == (k2 > 5.991465)


def test_lix_rix_match_python_token_counts(spark):
    rows = {r["doc_id"]: r for r in QUERIES["text_lix_readability"](spark, SF).collect()}
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        toks = d["text"].split(" ")
        n_words = len(toks)
        n_long = sum(1 for w in toks if len(w) > 6)
        n_sent = max(
            sum(d["text"].count(p) for p in ".!?"),
            1,
        )
        r = rows[d["doc_id"]]
        assert r["n_words"] == n_words
        assert r["n_long"] == n_long
        assert r["n_sentences"] == n_sent
        assert abs(r["lix"] - (n_words / n_sent + 100 * n_long / n_words)) < 1e-3
        assert abs(r["rix"] - n_long / n_sent) < 1e-3
