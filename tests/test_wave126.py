"""Wave-126 semantics: QL smoothing behavior, distribution-rank
invariants, circular-stat identities."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_ql_top_docs_contain_query_terms(spark):
    rows = QUERIES["text_query_likelihood_dirichlet"](spark, SF).collect()
    assert rows
    langs = {r["lang"] for r in rows}
    for lang in langs:
        lr = sorted((r for r in rows if r["lang"] == lang), key=lambda r: r["rk"])
        assert [r["rk"] for r in lr] == list(range(1, len(lr) + 1))
        # scores decrease with rank (ties broken by doc_id, scores sorted)
        scores = [r["score_micro"] for r in lr]
        assert scores == sorted(scores, reverse=True)


def test_distribution_ranks_invariants(spark):
    rows = QUERIES["win_distribution_ranks"](spark, SF).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["c_nationkey"]].append(r)
    for nk, rs in per.items():
        assert {r["quartile"] for r in rs} <= {1, 2, 3, 4}
        assert max(r["pct_rank"] for r in rs) == 1.0 or len(rs) == 1
        assert max(r["cume"] for r in rs) == 1.0
        assert min(r["pct_rank"] for r in rs) == 0.0


def test_circular_stats_identities(spark):
    rows = QUERIES["agg_circular_hour_stats"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["resultant_r"] <= 1.0
        assert abs(r["resultant_r"] + r["circ_variance"] - 1.0) < 1e-9
        assert 0.0 <= r["mean_dir_deg"] < 360.0
        # resultant consistent with raw sums
        rr = math.sqrt(r["cs"] ** 2 + r["ss"] ** 2) / (r["n"] * 1e6)
        assert abs(rr - r["resultant_r"]) < 1e-6
