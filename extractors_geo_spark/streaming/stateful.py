"""Custom stateful streaming operators (applyInPandasWithState).

The reference's queue gives at-least-once delivery, so a consumer must be
idempotent; the engine's streaming analog is an explicit cross-batch
dedup + per-key counters implemented with applyInPandasWithState
(SURVEY.md ST1/ST2: stateful dropDuplicates + health counters).

  stateful_dedup_stream   emits each image_id at most once across all
                          micro-batches (state = seen set per key group)
  running_counters_stream per-activity running totals, emitted per batch
  stateful_sessions       per-user sessionization with inactivity gap +
                          EVENT-TIME TIMEOUT (bounded state; idle
                          sessions drain as the watermark advances)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("activity", T.StringType()),
    T.StructField("first_seen_batch", T.IntegerType()),
])
DEDUP_STATE = T.StructType([T.StructField("seen", T.ArrayType(T.StringType())),
                            T.StructField("batches", T.IntegerType())])


def _dedup_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    seen, batches = (state.get if state.exists else ([], 0))
    seen_set = set(seen)
    out = []
    for pdf in pdfs:
        for iid, act in zip(pdf["image_id"], pdf["activity"]):
            if iid not in seen_set:
                seen_set.add(iid)
                out.append({"image_id": iid, "activity": act, "first_seen_batch": batches})
    state.update((list(seen_set), batches + 1))
    yield pd.DataFrame(out, columns=["image_id", "activity", "first_seen_batch"])


def stateful_dedup(stream: DataFrame, shard_mod: int = 16) -> DataFrame:
    """Cross-batch exactly-once emission per image_id. Keys are sharded by
    hash so state is distributed (a single global key would serialize);
    state per shard is the seen-id set — bounded by ids per shard, the
    same bound a stateful dropDuplicates holds."""
    from pyspark.sql import functions as F

    sharded = stream.withColumn("shard", F.pmod(F.xxhash64("image_id"), F.lit(shard_mod)))
    return (
        sharded.groupBy("shard")
        .applyInPandasWithState(
            _dedup_fn, DEDUP_OUT, DEDUP_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


COUNTER_OUT = T.StructType([
    T.StructField("activity", T.StringType()),
    T.StructField("batch_events", T.LongType()),
    T.StructField("total_events", T.LongType()),
])
COUNTER_STATE = T.StructType([T.StructField("total", T.LongType())])


def _counter_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (total,) = state.get if state.exists else (0,)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    total += n
    state.update((total,))
    yield pd.DataFrame([{"activity": key[0], "batch_events": n, "total_events": total}])


def running_counters(stream: DataFrame) -> DataFrame:
    """Per-activity running totals across micro-batches — the extractor
    fleet health counters (per-partition metrics, north rule)."""
    return stream.groupBy("activity").applyInPandasWithState(
        _counter_fn, COUNTER_OUT, COUNTER_STATE, "append", GroupStateTimeout.NoTimeout
    )


def stateful_sessions(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user SESSIONIZATION with an inactivity gap — the streaming twin
    of the batch `sessionize` query, but with true incremental state.

    Per user_id the state carries (session_start, last_ts, n_events,
    sum_value). Events with a gap > gap_seconds close the open session
    (emitted downstream); an EVENT-TIME TIMEOUT closes idle sessions
    once the watermark passes last_ts + gap, so state is bounded and
    sessions drain without requiring a newer event from the same user.
    Input: the events table shape (ts, user_id, value). Output one row
    per CLOSED session."""
    out_schema = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, sum_value double")
    state_schema = "start long, last long, n long, sv double"
    gap_ms = gap_seconds * 1000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": key[0],
                "session_start": pd.Timestamp(start, unit="ms"),
                "session_end": pd.Timestamp(last, unit="ms"),
                "n_events": n, "sum_value": sv,
            }])
            return
        ev = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_ms = (ev["ts"].astype("int64") // 1_000_000).tolist()
        vals = ev["value"].fillna(0.0).tolist()
        if state.exists:
            start, last, n, sv = state.get
        else:
            start, last, n, sv = ts_ms[0], ts_ms[0] - 1, 0, 0.0
        closed = []
        for t, v in zip(ts_ms, vals):
            if n and t - last > gap_ms:
                closed.append((start, last, n, sv))
                start, n, sv = t, 0, 0.0
            # a late in-watermark event may pre-date the open session's
            # start (cross-batch out-of-order arrival): within gap, extend
            # the session backwards so session_start/n_events agree with
            # the batch sessionize twin; older than that, it is its own
            # closed single-event session in the batch twin (ADVICE r5)
            if n and start - t > gap_ms:
                closed.append((t, t, 1, float(v)))
                continue
            start = min(start, t)
            last = max(last, t)
            n += 1
            sv += float(v)
        state.update((start, last, n, sv))
        # event-time timeout: fire once the watermark passes the gap
        state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            yield pd.DataFrame([{
                "user_id": key[0],
                "session_start": pd.Timestamp(s, unit="ms"),
                "session_end": pd.Timestamp(e, unit="ms"),
                "n_events": cn, "sum_value": cv,
            } for s, e, cn, cv in closed])

    return (
        stream.withWatermark("ts", watermark)
        .select("ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )


def sessions_to_table(
    spark,
    stream: DataFrame,
    table,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
):
    """Sessionization end-to-end (VERDICT r5 #9): stateful_sessions ->
    SnapshotTable APPEND per micro-batch with EXACTLY-ONCE semantics,
    reusing the removal path's idempotence machinery — batch ids are
    namespaced by checkpoint location, recorded in the commit summary,
    and re-delivered batches (crash after table commit, before
    checkpoint ack) are skipped on restart. Returns the StreamingQuery.

    `table` is a SnapshotTable bucketed on user_id (or its root path)."""
    from ..sources.snapshot_table import SnapshotTable
    from .removal import _applied_batch_ids

    if isinstance(table, str):
        table = SnapshotTable(spark, table, bucket_key="user_id")
    applied = _applied_batch_ids(table)

    def on_batch(batch: DataFrame, batch_id: int) -> None:
        bid = f"{checkpoint_dir}:{batch_id}"
        if bid in applied:
            return  # re-delivered batch: already committed to the table
        if batch.isEmpty():
            return
        table.append(batch, summary_extra={"stream_batch_id": bid})
        applied.add(bid)

    return (
        stateful_sessions(stream, gap_seconds=gap_seconds, watermark=watermark)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
