"""Wave-132: foreach ack exactly-once; timeout sessions == batch gap
sessions (minus each user's final open session)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_foreach_ack_exactly_once(spark):
    acks = [r["event_id"] for r in QUERIES["stream_foreach_ack"](spark, SF).collect()]
    src = {r["event_id"] for r in table(spark, SF, "events").select("event_id").collect()}
    assert len(acks) == len(src)  # no duplicate acks
    assert set(acks) == src  # every event acked, nothing else


def test_timeout_sessions_match_batch_gap_sessions(spark):
    got = {
        (r["user_id"], r["session_start_ms"]): (r["session_end_ms"], r["n_events"])
        for r in QUERIES["stream_session_timeout"](spark, SF).collect()
    }
    assert got  # watermark advance must close at least some sessions
    # batch truth: 30-min gap sessionization per user
    raw = (
        table(spark, SF, "events")
        .select("user_id", F.unix_millis("ts").alias("ms"), "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in raw:
        per[r["user_id"]].append((r["ms"], r["event_id"]))
    truth = {}
    last_session = set()
    for u, evs in per.items():
        evs.sort()
        start = last = evs[0][0]
        n = 1
        for m, _ in evs[1:]:
            if m - last > 30 * 60 * 1000:
                truth[(u, start)] = (last, n)
                start, last, n = m, m, 1
            else:
                last, n = m, n + 1
        truth[(u, start)] = (last, n)
        last_session.add((u, start))
    # every emitted session is exactly a batch session
    for k, v in got.items():
        assert truth[k] == v
    # everything missing is each user's final (still-open) session
    missing = set(truth) - set(got)
    assert missing <= last_session
