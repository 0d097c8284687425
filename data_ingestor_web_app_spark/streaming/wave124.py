"""Wave-124 streaming member: sharded space-saving heavy-hitter sketch in
explicit stream state. Back-of-registry module.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_web_app_spark.registry import query
from data_ingestor_web_app_spark.streaming import runtime

_SS_CAP = 32  # counters per shard
_SS_SHARDS = 8


@query("stream_space_saving_topk")  # rows-only: sketch state, no SQL twin
def stream_space_saving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded space-saving heavy hitters (Metwally, Agrawal & El Abbadi,
    ICDT 2005, public) as a custom stateful streaming operator: events
    are sharded by user hash; each shard's applyInPandasWithState keeps
    at most 32 (user, est_count, err_bound) counters across micro-batches
    — on a miss with a full sketch, the minimum counter is evicted and
    its count+1 becomes the newcomer's estimate with err = old minimum.
    The textbook guarantees (est >= true >= est - err; any user with
    true shard count > N_shard/capacity is monitored) are asserted in
    pytest against the exact batch counts.

    This is how a 100 TB ingest watches its top talkers without a
    per-user groupBy: O(capacity) state per shard regardless of user
    cardinality, one shuffle on the shard key, merged downstream by
    summing per-shard estimates (merge keeps the bounds).

    Replay order within a batch is the total (ts, event_id) order, with
    the whole key-batch buffered before sorting (the wave-122 lesson:
    per-chunk sorting breaks the order when a shard spans Arrow chunks)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = runtime.events_stream(spark, sf_dir).select(
        F.pmod(F.xxhash64("user_id"), F.lit(_SS_SHARDS)).alias("shard"),
        "ts",
        "event_id",
        "user_id",
    )

    def update(key, pdf_iter, state: GroupState):
        (shard,) = key
        if state.exists:
            keys, counts, errs, n_seen = state.get
            keys, counts, errs = list(keys), list(counts), list(errs)
        else:
            keys, counts, errs, n_seen = [], [], [], 0
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            pos = {k: i for i, k in enumerate(keys)}
            for u in pdf["user_id"]:
                u = int(u)
                n_seen += 1
                i = pos.get(u)
                if i is not None:
                    counts[i] += 1
                elif len(keys) < _SS_CAP:
                    pos[u] = len(keys)
                    keys.append(u)
                    counts.append(1)
                    errs.append(0)
                else:
                    # evict the minimum-count counter (ties: lowest index,
                    # deterministic), inherit its count as the error bound
                    j = min(range(len(counts)), key=lambda x: counts[x])
                    del pos[keys[j]]
                    pos[u] = j
                    errs[j] = counts[j]
                    counts[j] += 1
                    keys[j] = u
        state.update((keys, counts, errs, n_seen))
        if chunks:  # no data -> no emission (avoids duplicate snapshots)
            yield pd.DataFrame(
                {
                    "shard": [int(shard)] * len(keys),
                    "user_id": keys,
                    "est_count": counts,
                    "err_bound": errs,
                    "shard_events": [n_seen] * len(keys),
                }
            )

    out = s.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=(
            "shard long, user_id long, est_count long, err_bound long, "
            "shard_events long"
        ),
        stateStructType=(
            "keys array<long>, counts array<long>, errs array<long>, "
            "n_seen long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    mem = runtime.run_to_memory(out, "update")
    # keep only each shard's FINAL sketch snapshot (max shard_events per
    # shard — n_seen strictly grows on every data-carrying batch, and
    # empty batches emit nothing); the update-mode memory sink keeps every
    # emission, and keeping anything older would resurrect evicted users
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard")
    return (
        mem.withColumn("mx", F.max("shard_events").over(w))
        .where(F.col("shard_events") == F.col("mx"))
        .drop("mx")
    )
