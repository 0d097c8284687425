"""Chaos tests for the exactly-once claims: kill a streaming query mid-run
(a real mid-batch executor exception, not a graceful stop), restart from
the same checkpoint, and assert no duplicates and no loss.

Covers the two production sink paths VERDICT r4 flagged as happy-path-only:
- the parquet file sink (_spark_metadata transaction log), and
- the foreachBatch copy-on-write CDC merge (snapshot pointer discipline).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.streaming import runtime


def test_parquet_sink_exactly_once_across_crash(spark, sf_small):
    src_dir = runtime.write_replay_files(spark, sf_small, 4)
    batch = table(spark, sf_small, "events")
    total = batch.count()
    # poison one event_id from the LAST ts-quartile chunk so batches 0-2
    # commit and batch 3 dies mid-processing while the marker exists
    cut = batch.withColumn("u", F.unix_micros("ts")).approxQuantile("u", [0.75], 0.0)[0]
    poison_id = (
        batch.withColumn("u", F.unix_micros("ts"))
        .where(F.col("u") > cut)
        .agg(F.max("event_id"))
        .collect()[0][0]
    )
    marker = os.path.join(tempfile.mkdtemp(prefix="chaos_"), "poison")
    open(marker, "w").close()

    @F.pandas_udf(LongType())
    def checked(eid: pd.Series) -> pd.Series:
        if os.path.exists(marker) and (eid == poison_id).any():
            raise RuntimeError("injected executor crash")
        return eid

    out = tempfile.mkdtemp(prefix="eo_chaos_out_") + "/events"
    ckpt = tempfile.mkdtemp(prefix="eo_chaos_ckpt_")

    def run():
        s = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .select("event_id", "user_id", checked("event_id").alias("checked"))
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="injected executor crash"):
        run()

    # after the crash: only committed batches visible, the dying batch's
    # partial files are invisible through _spark_metadata
    after_crash = spark.read.parquet(out)
    n_crash = after_crash.count()
    assert 0 < n_crash < total
    assert after_crash.select("event_id").distinct().count() == n_crash

    os.remove(marker)
    run()  # restart from the same checkpoint: replays ONLY the failed batch

    final = spark.read.parquet(out)
    assert final.count() == total  # no loss
    assert final.select("event_id").distinct().count() == total  # no dupes
    src_ids = {r[0] for r in batch.select("event_id").collect()}
    got_ids = {r[0] for r in final.select("event_id").collect()}
    assert got_ids == src_ids


def test_cdc_upsert_restart_after_midwrite_crash(spark, sf_small):
    from data_ingestor_web_app_spark.operators.upsert import _changelog

    base = table(spark, sf_small, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="cdc_chaos_")
    chg_dir = os.path.join(root, "changelog")
    current = {"dir": os.path.join(root, "snapshot_v0")}
    base.write.mode("overwrite").parquet(current["dir"])
    chg = _changelog(base).withColumn("part", F.pmod("key", F.lit(3)))
    for i in range(3):
        chg.where(F.col("part") == i).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(chg_dir)
    chg_schema = chg.drop("part").schema
    crash_once = {"armed": True}

    def merge_batch(batch_df, batch_id):
        snap = batch_df.sparkSession.read.parquet(current["dir"])
        b = batch_df
        merged = (
            snap.join(b, snap.o_orderkey == b.key, "full_outer")
            .where(F.coalesce(F.col("op"), F.lit("")) != "D")
            .select(
                F.coalesce(F.col("key"), F.col("o_orderkey")).alias("o_orderkey"),
                F.coalesce(F.col("new_status"), F.col("o_orderstatus")).alias(
                    "o_orderstatus"
                ),
                F.coalesce(F.col("new_totalprice"), F.col("o_totalprice")).alias(
                    "o_totalprice"
                ),
            )
        )
        next_dir = os.path.join(root, f"snapshot_v{batch_id + 1}")
        merged.write.mode("overwrite").parquet(next_dir)
        # crash AFTER the snapshot write but BEFORE the pointer advance —
        # the worst spot: data on disk, commit not recorded
        if batch_id == 1 and crash_once["armed"]:
            crash_once["armed"] = False
            raise RuntimeError("injected crash after write, before pointer advance")
        current["dir"] = next_dir

    def run():
        q = (
            spark.readStream.schema(chg_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chg_dir)
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="injected crash"):
        run()
    assert current["dir"].endswith("snapshot_v1")  # pointer never advanced
    run()  # restart: batch 1 replays from the intact v1 snapshot

    final = spark.read.parquet(current["dir"]).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    # one-shot batch MERGE is the ground truth
    c = _changelog(base)
    expected = (
        base.join(c, base.o_orderkey == c.key, "full_outer")
        .where(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("key"), F.col("o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("new_status"), F.col("o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.round(
                F.coalesce(F.col("new_totalprice"), F.col("o_totalprice")), 2
            ).alias("o_totalprice"),
        )
    )
    assert final.count() == expected.count()
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0


def test_foreach_ack_exactly_once_across_two_crashes(spark, sf_small):
    """R13 ack ledger under chaos (r5 VERDICT item 6): kill the ack stream
    mid-batch TWICE (different batches), restart from the same checkpoint
    each time, and assert ack-set IDENTITY — every event acked exactly
    once, none lost, none duplicated. The idempotence mechanism is the
    writer's (epoch, partition)-keyed truncate-on-open files
    (streaming/wave132.make_ack_writer): a replayed task overwrites its
    own failed attempt instead of appending — the reference's drain
    semantics (main.go:259-262: workers finish, nothing acked twice on
    the wire) re-expressed as an idempotent ledger."""
    from data_ingestor_web_app_spark.streaming.wave132 import make_ack_writer

    src_dir = runtime.write_replay_files(spark, sf_small, 4)
    batch = table(spark, sf_small, "events")
    total = batch.count()
    src_ids = {r[0] for r in batch.select("event_id").collect()}

    # two poison ids in DIFFERENT replay chunks (2nd and 4th ts-quartile)
    # so the two injected crashes kill two different micro-batches
    qs = batch.withColumn("u", F.unix_micros("ts")).approxQuantile(
        "u", [0.25, 0.5, 0.75], 0.0
    )
    u = batch.withColumn("u", F.unix_micros("ts"))
    poison = [
        u.where((F.col("u") > qs[0]) & (F.col("u") <= qs[1]))
        .agg(F.max("event_id"))
        .collect()[0][0],
        u.where(F.col("u") > qs[2]).agg(F.max("event_id")).collect()[0][0],
    ]
    root = tempfile.mkdtemp(prefix="ack_chaos_")
    markers = [os.path.join(root, f"poison{i}") for i in range(2)]
    for m in markers:
        open(m, "w").close()

    @F.pandas_udf(LongType())
    def checked(eid: pd.Series) -> pd.Series:
        for m, pid in zip(markers, poison):
            if os.path.exists(m) and (eid == pid).any():
                raise RuntimeError("injected executor crash")
        return eid

    ack_dir = os.path.join(root, "acks")
    os.makedirs(ack_dir)
    ckpt = os.path.join(root, "ckpt")

    def run():
        s = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            # ck must survive projection pruning or Catalyst elides the
            # crash injector entirely; the writer only reads event_id
            .select("event_id", checked("event_id").alias("ck"))
        )
        q = (
            s.writeStream.foreach(make_ack_writer(ack_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def ledger() -> list[int]:
        ids = []
        for fn in os.listdir(ack_dir):
            with open(os.path.join(ack_dir, fn)) as f:
                for line in f:
                    assert line.startswith("ACK ")
                    ids.append(int(line[4:]))
        return ids

    # crash #1 (batch holding poison[0]); some ack files of the dying
    # batch may already be on disk — that's the at-least-once exposure
    with pytest.raises(Exception, match="injected executor crash"):
        run()
    os.remove(markers[0])
    # crash #2 (a later batch), restarted from the same checkpoint
    with pytest.raises(Exception, match="injected executor crash"):
        run()
    os.remove(markers[1])
    run()  # final restart: replays only uncommitted batches

    acks = ledger()
    assert len(acks) == total, "ack count != event count (lost or duplicated)"
    assert len(set(acks)) == total, "duplicate acks survived replay"
    assert set(acks) == src_ids, "ack set differs from source ids"
