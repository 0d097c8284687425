"""Wave-121 semantic checks."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_map_mrr_consistent_with_ndcg_frame(spark):
    mm = {r.qid: r for r in QUERIES["model_map_mrr_retrieval"](spark, SF_SMALL).collect()}
    nd = {r.qid: r for r in QUERIES["model_ndcg_retrieval"](spark, SF_SMALL).collect()}
    assert set(mm) == set(nd)
    for qid, r in mm.items():
        # both metrics rank the same frame -> identical relevant counts
        assert r.n_rel == nd[qid].n_rel
        if r.n_rel:
            assert 1 <= r.first_rel_rank <= 10
            assert abs(r.reciprocal_rank - round(1 / r.first_rel_rank, 6)) < 2e-6
            assert 0 < r.avg_precision <= 1
            # AP == 1 iff all relevant items are packed at the top
            if r.first_rel_rank == 1 and r.n_rel == 10:
                assert r.avg_precision == 1.0
            # exact integer identity: ap_scaled is divisible consistently
            assert abs(
                r.avg_precision - round(r.ap_scaled / (2520 * r.n_rel), 6)
            ) < 2e-6
        else:
            assert r.first_rel_rank is None and r.reciprocal_rank is None


def test_burstiness_dp_matches_python(spark):
    rows = {r.tok: r for r in QUERIES["text_burstiness_dp"](spark, SF_SMALL).collect()}
    assert len(rows) == 15
    pdf = table(spark, SF_SMALL, "documents").select("doc_id", "text").toPandas()
    doc_toks = {r.doc_id: r.text.split(" ") for r in pdf.itertuples(index=False)}
    sizes = {d: len(t) for d, t in doc_toks.items()}
    total = sum(sizes.values())
    counts = Counter()
    for t in doc_toks.values():
        counts.update(t)
    top15 = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    for tok, t in top15:
        num = 0
        n_docs = 0
        for d, toks in doc_toks.items():
            c = toks.count(tok)
            if c:
                n_docs += 1
            num += abs(c * total - sizes[d] * t)
        r = rows[tok]
        assert r.tok_total == t
        assert r.n_docs == n_docs
        assert abs(r.dp - round(num / (2.0 * t * total), 6)) < 2e-6
        assert 0 <= r.dp < 1


def test_interval_coalesce_matches_python_sweep(spark):
    rows = {
        r.user_id: r for r in QUERIES["join_interval_coalesce"](spark, SF_SMALL).collect()
    }
    pdf = (
        table(spark, SF_SMALL, "events")
        .select("user_id", F.unix_timestamp("ts").alias("s"))
        .toPandas()
    )
    for uid, g in pdf.groupby("user_id"):
        iv = sorted((int(s), int(s) + 300) for s in g["s"])
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        r = rows[uid]
        assert r.n_merged == len(merged)
        assert r.covered_sec == sum(e - s for s, e in merged)
        assert r.longest_sec == max(e - s for s, e in merged)
        # coverage can never exceed raw interval-seconds
        assert r.covered_sec <= 300 * len(iv)
