"""Wave-49 semantic checks."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_ingestor_web_app_spark.registry import QUERIES
from tests.conftest import SF_SMALL


def test_compression_ratio_orders_repetition_vs_entropy(spark):
    rows = {r.doc_id: r for r in QUERIES["text_compression_quality"](spark, SF_SMALL).collect()}
    assert rows
    for r in rows.values():
        # entropy bound: 0 < n*H/8 <= n_bytes (ASCII fixture => <= 1.0),
        # and the bound is consistent with its own pieces
        assert 0 < r.compression_ratio < 1.0
        assert abs(r.entropy_bits / (8 * r.n_bytes) - r.compression_ratio) < 1e-5
        assert r.n_chars <= r.n_bytes  # utf-8 never shorter than chars

    # the signal still orders text quality the way the zlib codec does:
    # repetitive boilerplate << fixture prose << uniform garble
    import math
    import random
    import zlib
    from collections import Counter

    def h0_ratio(s: str) -> float:
        cnt = Counter(s)
        n = len(s)
        bits = sum(k * math.log2(n / k) for k in cnt.values())
        return bits / (8 * len(s.encode()))

    rep = "the same phrase again " * 100
    rng = random.Random(7)
    garble = "".join(chr(rng.randrange(33, 127)) for _ in range(2000))
    fix_min = min(r.compression_ratio for r in rows.values())
    fix_max = max(r.compression_ratio for r in rows.values())
    assert h0_ratio(rep) < fix_min < fix_max < h0_ratio(garble)
    # same ordering under the real codec (the signal the bound stands in for)
    z = lambda s: len(zlib.compress(s.encode(), 6)) / len(s.encode())  # noqa: E731
    assert z(rep) < z(garble)


def test_runs_test_counts_consistent(spark):
    row = QUERIES["agg_runs_test"](spark, SF_SMALL).first()
    assert row.n_runs >= 1
    assert row.n_plus + row.n_minus >= row.n_runs - 1
    assert row.expected_runs > 0


def test_outage_gaps_are_real_gaps(spark):
    from data_ingestor_web_app_spark.io import table

    gaps = QUERIES["events_outage_gaps"](spark, SF_SMALL).collect()
    mins = {
        r.m for r in table(spark, SF_SMALL, "events")
        .select(F.date_trunc("minute", "ts").alias("m")).distinct().collect()
    }
    for g in gaps[:50]:
        assert g.gap_minutes > 5
        # no active minute strictly inside the reported gap
        import datetime as dt

        start = dt.datetime.strptime(g.gap_start, "%Y-%m-%d %H:%M:%S")
        end = dt.datetime.strptime(g.resume_at, "%Y-%m-%d %H:%M:%S")
        inside = [m for m in mins if start < m < end]
        assert not inside, (g, inside[:3])


def test_update_mode_emits_deltas_not_snapshots(spark):
    """The update-mode changelog must contain MORE rows than distinct keys
    (multiple emissions across the 4-batch replay)."""
    from data_ingestor_web_app_spark.streaming import runtime
    import pyspark.sql.functions as FF

    s = runtime.events_stream(spark, SF_SMALL)
    agg = s.groupBy("event_type").agg(FF.count("*").alias("n_events"))
    changelog = runtime.run_to_memory(agg, "update")
    rows = changelog.collect()
    keys = {r.event_type for r in rows}
    assert len(rows) > len(keys)  # deltas, not one snapshot


def test_walk_forward_splits_respect_time_order(spark):
    """Per fold: the train window must end strictly before the test
    window starts — the temporal-integrity invariant of walk-forward CV."""
    from data_ingestor_web_app_spark.io import table

    rows = {(r.fold, r.role): r for r in
            QUERIES["pipeline_walk_forward_splits"](spark, SF_SMALL).collect()}
    e = table(spark, SF_SMALL, "events")
    d0 = e.agg(F.min(F.col("ts").cast("date"))).first()[0]
    for fold in (1, 2, 3, 4):
        assert (fold, "train") in rows and (fold, "test") in rows
        # train grows with fold (expanding window)
        if fold > 1:
            assert rows[(fold, "train")].n_events > rows[(fold - 1, "train")].n_events
