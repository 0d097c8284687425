"""Wave-154: rejection matching improves distributional fit."""

from __future__ import annotations

from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_rejection_match_improves_tv_distance(spark):
    rows = QUERIES["pipeline_rejection_match_length"](spark, SF).collect()
    assert rows
    src_tot = sum(r["src_docs"] for r in rows)
    acc_tot = sum(r["accepted_docs"] for r in rows)
    tgt_tot = sum(r["target_docs"] for r in rows)
    assert 0 < acc_tot <= src_tot

    def tv(counts, total):
        return 0.5 * sum(
            abs(c / total - r["target_docs"] / tgt_tot)
            for c, r in zip(counts, rows)
        )

    tv_before = tv([r["src_docs"] for r in rows], src_tot)
    tv_after = tv([r["accepted_docs"] for r in rows], acc_tot)
    # matching must not make the shape worse (allowing small-sample noise)
    assert tv_after <= tv_before + 0.05
    # acceptance can never exceed the source in any bucket
    for r in rows:
        assert 0 <= r["accepted_docs"] <= r["src_docs"]
