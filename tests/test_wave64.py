"""Wave-64 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_topn_other_reconciles_to_total(spark):
    rows = QUERIES["agg_topn_other_bucket"](spark, SF_SMALL).collect()
    n_events = table(spark, SF_SMALL, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        named = [r for r in rs if r.bucket != "OTHER"]
        assert len(named) <= 3
        for r in named:
            assert r.n_users == 1


def test_absorption_probability_monotone_in_steps(spark):
    rows = QUERIES["events_absorption_probability"](spark, SF_SMALL).collect()
    assert rows and all(r.state != "purchase" for r in rows)
    for r in rows:
        # more steps can only add probability mass
        assert 0 <= r.p_absorb_1 <= r.p_absorb_2 + 1e-9
        assert r.p_absorb_2 <= r.p_absorb_3 + 1e-9
        assert r.p_absorb_3 <= 1


def test_qa_spans_pick_rarest_token_with_context(spark):
    rows = QUERIES["pipeline_qa_span_extract"](spark, SF_SMALL).collect()
    docs = {
        r.doc_id: r.text
        for r in table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    }
    assert len(rows) == len(docs)
    from collections import Counter

    global_counts = Counter()
    for text in docs.values():
        global_counts.update(text.split(" "))
    for r in rows[:50]:
        toks = docs[r.doc_id].split(" ")
        assert toks[r.answer_pos - 1] == r.answer
        assert r.answer_global_count == global_counts[r.answer]
        # no token in this doc is strictly rarer
        assert all(global_counts[t] >= r.answer_global_count for t in toks)
        assert r.answer in r.context.split(" ")


def test_mann_kendall_consistent_with_theil_sen(spark):
    mk = QUERIES["agg_mann_kendall"](spark, SF_SMALL).first()
    ts = QUERIES["agg_theil_sen"](spark, SF_SMALL).first()
    assert mk.n_months == ts.n_months
    assert mk.var_s > 0
    # a significant monotone verdict must agree with the sen slope sign
    if mk.verdict == "increasing":
        assert ts.theil_sen_slope > 0
    if mk.verdict == "decreasing":
        assert ts.theil_sen_slope < 0
