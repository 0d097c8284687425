"""Wave-350: HOF shelf vs direct python token math."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_hof_shelf_replay(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF, "documents").collect()
    }
    got = {
        r["doc_id"]: r
        for r in QUERIES["fn_lambda_hof_shelf"](spark, SF).collect()
    }
    assert set(got) == set(docs)
    for did, text in docs.items():
        toks = text.split(" ")
        ls = [len(t) for t in toks]
        row = got[did]
        assert row["n_tokens"] == len(toks)
        assert row["total_chars"] == sum(ls)
        assert row["n_long_tokens"] == sum(1 for t in toks if len(t) > 4)
        assert row["has_the"] == ("the" in toks)
        assert row["all_nonempty"] == all(len(t) > 0 for t in toks)
        assert row["sum_sq_lens"] == sum(x * x for x in ls)
        assert row["palindrome_dot"] == sum(
            a * b for a, b in zip(ls, reversed(ls))
        )
