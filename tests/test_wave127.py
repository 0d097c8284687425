"""Wave-127: RRF fusion invariants; streaming rate limit == batch."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_rrf_fusion_ranks_consistent(spark):
    rows = QUERIES["model_rrf_fusion"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["rank_ql"] >= 1 and r["rank_bm"] >= 1
        expected = round(1e6 / (60 + r["rank_ql"])) + round(1e6 / (60 + r["rank_bm"]))
        assert r["rrf_micro"] == expected
    # a doc ranked #1 by BOTH rankers must be fused rank 1
    for lang in {r["lang"] for r in rows}:
        lr = [r for r in rows if r["lang"] == lang]
        both_first = [r for r in lr if r["rank_ql"] == 1 and r["rank_bm"] == 1]
        if both_first:
            assert both_first[0]["rk"] == 1


def test_stream_rate_limit_equals_batch(spark):
    stream_out = {
        (r["user_id"], r["event_id"]): (r["admitted"], r["tokens_after"])
        for r in QUERIES["stream_rate_limit"](spark, SF).collect()
    }
    batch_out = {
        (r["user_id"], r["event_id"]): (r["admitted"], r["tokens_after"])
        for r in QUERIES["events_rate_limit"](spark, SF).collect()
    }
    assert stream_out == batch_out
