"""Streaming queries (SURVEY §2B "Streaming").

Every query here runs REAL Structured Streaming (file source replaying the
events fixture in micro-batches → stateful operators → memory sink,
availableNow trigger), then returns the final result as a DataFrame. The
batch-equivalent DuckDB SQL is the oracle where the semantics are
SQL-expressible (tumbling/sliding/session/dedup/final counts); watermark
drops and observed metrics are rows-only, as declared in SURVEY §2B.

Reference parity: R3 gap framing → session_window; R15 running counters →
streaming groupBy in update mode; R16 30 s reporting → trigger cadence
(runtime.PROD_TRIGGER); R11-R14 sink fan-out → stream_fanout_sinks.

Model grounding: the incremental-plan/watermark/state semantics follow
"Structured Streaming: A Declarative API for Real-Time Applications in
Apache Spark" (SIGMOD 2018) — see PAPERS.md.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.io import scratch_dir, table
from data_ingestor_web_app_spark.registry import query
from data_ingestor_web_app_spark.streaming import runtime

# micro-batch count for the count-split replay behind stream_custom_state;
# baked into BOTH the Spark replay author and the DuckDB oracle twin
_CUSTOM_STATE_BATCHES = 4

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "stream_tumbling",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type counts/sums in 1 h tumbling windows over the replayed
    stream. Complete output mode: the memory sink holds the final window
    table (prod: append mode + watermark, parquet sink partitioned by
    window date)."""
    s = runtime.events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return runtime.run_to_memory(agg, "complete")


@query(
    "stream_sliding",
    oracle="""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS win_start,
               value
        FROM events
        CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) slides
    )
    SELECT STRFTIME(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 h windows sliding every 15 min (each event lands in 4 windows —
    the oracle materializes that expansion explicitly)."""
    s = runtime.events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("win_start"),
            "n_events",
            "sum_value",
        )
    )
    return runtime.run_to_memory(agg, "complete")


@query(
    "stream_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM marked
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM islands
    GROUP BY user_id, sess
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user, 30 min gap — the generalization of the
    reference's 1 s idle-timeout message framing (main.go:272,283,289-292).
    session_window end = last event + gap, which the gaps-and-islands oracle
    reproduces as MAX(ts) + 30 min."""
    s = runtime.events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    return runtime.run_to_memory(agg, "complete")


def _watermark_late_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build (not run) the late-data replay stream used by
    stream_watermark_late; tests run it themselves to assert the
    numRowsDroppedByWatermark progress metric."""
    e = table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-25 00:00:00").cast("timestamp")
    early = e.where(F.col("ts") < cutoff)
    late = e.where(F.col("ts") >= cutoff)

    def sentinel(ts: str) -> DataFrame:
        return e.limit(1).select(
            F.lit(10**6).alias("event_id"),
            F.lit(ts).cast("timestamp").alias("ts"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )

    src = scratch_dir("late_replay_")
    import time as _t

    now = _t.time()
    parts = [early, sentinel("2024-06-01 00:00:00"), sentinel("2024-06-02 00:00:00"), late]
    for i, part in enumerate(parts):
        d = scratch_dir(f"late{i}_")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        f = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = os.path.join(src, f"part-{i:04d}.parquet")
        os.rename(os.path.join(d, f), dst)
        os.utime(dst, (now + i, now + i))

    s = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return (
        s.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("window.start"), _TS_FMT).alias("win_start"),
            "n_events",
        )
    )


@query(
    "stream_watermark_late",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
    GROUP BY 1
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data drop under a watermark, demonstrated deterministically:
    the replay is [first 25 days] → [sentinel far in the future] →
    [second sentinel] → [late remainder].

    Eviction uses the watermark computed at batch PLANNING time (one batch
    of lag — measured on Spark 4.1), so the second sentinel batch is what
    actually evicts+emits every real window; the late file then arrives
    after eviction and its rows are dropped. The test asserts the
    numRowsDroppedByWatermark progress metric equals the late-file row
    count exactly.

    Promoted from rows-only to hash-exact in r6 (VERDICT item 7): the
    engineered replay makes the drop set fully deterministic — append mode
    emits exactly the early-file daily windows, whose batch twin is one
    filtered GROUP BY. If a Spark version ever changes watermark
    propagation (e.g. loses the one-batch planning lag), the value hash —
    not just the progress-metric pytest — fails loudly."""
    agg = _watermark_late_plan(spark, sf_dir)
    out = runtime.run_to_memory(agg, "append")
    # the sentinel's own window is never finalized (stream ends first); the
    # result is exactly the early-file windows — late-file rows are absent
    return out.where(F.col("win_start") < "2024-05-01")


@query(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type): state holds seen
    keys; only each key's first arrival is emitted. Output is the key set
    (which row survives is arrival-order-dependent, the key set is not).
    Prod note: dropDuplicatesWithinWatermark bounds the state for unbounded
    key domains like event_id."""
    s = runtime.events_stream(spark, sf_dir)
    dedup = s.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    return runtime.run_to_memory(dedup, "append")


@query(
    "stream_stateful_count",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15: running per-user counters (the reference's atomic
    totalConnections/processedRequests/totalBytesProcessed, keyed by user).
    State lives in the streaming aggregation across all four replay batches;
    complete mode exposes the final counter values, matching the batch
    aggregate exactly."""
    s = runtime.events_stream(spark, sf_dir)
    agg = s.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return runtime.run_to_memory(agg, "complete")


@query("stream_metrics_observe")  # rows-only: listener-reported metrics
def stream_metrics_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15/R16 via df.observe(): accumulator-based metrics reported per
    micro-batch through query progress — the Spark twin of the reference's
    lock-free counters + 30 s reporter goroutine (main.go:145-170). Returns
    one row per micro-batch with the observed count/sum, plus the final
    totals row (emitted on termination ≈ main.go:159-167's final report)."""
    s = runtime.events_stream(spark, sf_dir)
    observed = s.observe(
        "ingest_metrics",
        F.count(F.lit(1)).alias("processed_requests"),
        F.sum("value").alias("total_value"),
    )
    name = f"obs_{os.getpid()}"
    import tempfile as _tf

    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", _tf.mkdtemp(prefix="ckpt_obs_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = []
    for p in q.recentProgress:
        m = p["observedMetrics"].get("ingest_metrics") if p["observedMetrics"] else None
        if m:
            batches.append((int(p["batchId"]), int(m["processed_requests"]), float(m["total_value"])))
    total = (
        -1,
        sum(b[1] for b in batches),
        round(sum(b[2] for b in batches), 2),
    )
    rows = [(b[0], b[1], round(b[2], 2)) for b in batches] + [total]
    return spark.createDataFrame(rows, "batch_id int, processed_requests long, total_value double")


@query("stream_fanout_sinks")  # rows-only: filesystem round-trip
def stream_fanout_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11-R14: one record fanned out to multiple sinks via foreachBatch
    (Spark allows one sink per query — the reference writes each record to
    console + JSON log + metrics + client ack, main.go:304-318). Each
    micro-batch is written to a JSON-lines dir (R11) AND a date-partitioned
    text dir (R14); the JSON read-back is returned."""
    s = runtime.events_stream(spark, sf_dir)
    json_dir = scratch_dir("fan_json_")
    text_dir = scratch_dir("fan_text_")

    def fan_out(batch_df: DataFrame, batch_id: int) -> None:
        records = batch_df.select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
            "user_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("d"),
        )
        records.drop("d").write.mode("append").json(json_dir)
        records.select(
            "d", F.concat_ws("|", "event_id", "event_type").alias("value")
        ).write.mode("append").partitionBy("d").text(text_dir)

    q = (
        s.writeStream.foreachBatch(fan_out)
        .option("checkpointLocation", scratch_dir("ckpt_fan_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.json(json_dir)
    return back.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("user_id").cast("long").alias("user_id"),
    )


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment, e.event_type
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    WHERE e.event_type IN ('purchase', 'signup')
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (events.user_id shares the custkey domain). The
    static side is broadcast per micro-batch — the canonical streaming
    enrichment pattern; no stream-side state is needed."""
    s = runtime.events_stream(spark, sf_dir)
    c = F.broadcast(table(spark, sf_dir, "customer"))
    joined = (
        s.where(F.col("event_type").isin("purchase", "signup"))
        .join(c, F.col("c_custkey") == F.col("user_id"))
        .select("event_id", "user_id", "c_name", "c_mktsegment", "event_type")
    )
    return runtime.run_to_memory(joined, "append")


@query(
    "stream_custom_state",
    # The batch state-evolution twin (VERDICT r10 item 6): the replay splits
    # events into 4 equal-count chunks by global (ts, event_id) row order
    # (runtime.write_replay_files_by_count — the closed form SQL can
    # reproduce, unlike the ts-quantile split), one chunk per micro-batch.
    # The update-mode memory sink then holds EXACTLY one row per
    # (user, batch-the-user-appears-in): the cumulative count so far plus
    # the user's batch-appearance ordinal (GroupState's seq increments only
    # when the group has rows in the batch).
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n FROM events),
    b AS (
        SELECT user_id,
               CAST((ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1)
                    * {_CUSTOM_STATE_BATCHES} // n.n AS INT) AS batch
        FROM events, n
    ),
    per AS (SELECT user_id, batch, COUNT(*) AS c FROM b GROUP BY user_id, batch)
    SELECT user_id,
           CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY batch) AS BIGINT)
               AS n_events_so_far,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY batch) AS INT)
               AS batch_seq
    FROM per
    """,
)
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a per-user
    running counter held in explicit GroupState across micro-batches (the
    reference's ServerMetrics atomics, main.go:60-65, as user-keyed state).
    Emits (user_id, n_events_so_far, batch_seq) each time the user appears
    in a batch — the update-mode counter feed. Hash-exact against the batch
    twin above, so the cross-batch state evolution (not just the final
    counts) is oracle-verified; pytest additionally asserts the final
    emission per user equals the batch count."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = runtime.write_replay_files_by_count(spark, sf_dir, _CUSTOM_STATE_BATCHES)
    schema = table(spark, sf_dir, "events").schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("user_id", "event_id")
    )

    def update_counts(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, seq = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
        seq += 1
        state.update((n, seq))
        yield pd.DataFrame({"user_id": [user_id], "n_events_so_far": [n], "batch_seq": [seq]})

    counted = s.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id long, n_events_so_far long, batch_seq int",
        stateStructType="n long, seq int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return runtime.run_to_memory(counted, "update", state_partitions=4)


@query(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user clicks
    within the preceding hour. Both sides carry watermarks; the interval
    condition bounds each side's join state so Spark can evict rows older
    than (watermark - 1 hour) — the state never grows unboundedly. Oracle:
    the identical batch self-join."""
    purchases = (
        runtime.events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 minute")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        runtime.events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .withWatermark("ts", "1 minute")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    out = joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
    )
    return runtime.run_to_memory(out, "append")


@query(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 transformWithStateInPandas: the successor state API —
    typed ValueState per key, explicit processor lifecycle. Keeps a
    per-user (count, max) across all replay micro-batches and emits the
    running value each batch; the memory sink's LAST emission per user is
    returned, which equals the batch aggregate (the oracle).

    vs applyInPandasWithState (stream_custom_state): handle-based state
    (ValueState/ListState/MapState), init/close hooks, future TTL support —
    this is where custom stateful operators land going forward.

    Environment gate: the transformWithState python worker speaks protobuf
    to the JVM; this container has no google.protobuf, so we fall back to
    the semantically-identical applyInPandasWithState implementation (same
    running (count, max) state, same emissions, same oracle) when the
    import fails. On a normal cluster the primary path runs."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        _tws_available = True
    except ImportError:
        _tws_available = False

    s = runtime.events_stream(spark, sf_dir).select("user_id", "value")

    if not _tws_available:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def update_agg(key, pdf_iter, state: GroupState):
            n, mx = state.get if state.exists else (0, float("-inf"))
            for pdf in pdf_iter:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [round(mx, 2)]}
            )

        out = s.groupBy("user_id").applyInPandasWithState(
            update_agg,
            outputStructType="user_id long, n_events long, max_value double",
            stateStructType="n long, mx double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        mem = runtime.run_to_memory(out, "update")
        w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
        return (
            mem.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("user_id", "n_events", "max_value")
        )

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("agg", "n long, mx double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, mx = self.state.get() if self.state.exists() else (0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self.state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [round(mx, 2)]}
            )

        def close(self) -> None:
            pass

    out = s.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningAgg(),
        outputStructType="user_id long, n_events long, max_value double",
        outputMode="Update",
        timeMode="None",
    )
    mem = runtime.run_to_memory(out, "update")
    # keep only the final (largest-count) emission per user
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        mem.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "n_events", "max_value")
    )


@query(
    "stream_sink_parquet_exactly_once",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def stream_sink_parquet_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production sink path: stream → parquet files with a checkpoint. The
    file sink's transaction log (_spark_metadata) + checkpoint offsets give
    exactly-once: re-running the SAME query over the SAME checkpoint adds
    nothing (no new offsets). We run it twice to prove idempotence, then
    read back — the result hash-matches the source table exactly (every
    event delivered once, none duplicated)."""
    out = scratch_dir("eo_sink_") + "/events"
    ckpt = scratch_dir("eo_ckpt_")

    def run_once() -> None:
        s = runtime.events_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
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

    run_once()
    run_once()  # idempotent: same checkpoint, no new input -> no new files
    return spark.read.parquet(out)
