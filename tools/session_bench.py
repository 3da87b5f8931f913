"""Stateful sessionization at scale (VERDICT r06 #10).

Streams N skewed events (one hot user holds ~10% of all events — the
crawl-fleet shape) through stateful_sessions in B file-fed micro-batches
and reports, from the engine's own StreamingQueryProgress records:

  - per-micro-batch wall time (linear, no blow-up as state accumulates)
  - state rows per batch (bounded by the active-user count, NOT by the
    event count — the event-time timeout drains idle sessions)
  - closed sessions emitted

Usage: python tools/session_bench.py [events] [batches] [users]
Prints one JSON line; numbers go to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from extractors_geo_spark.session import get_spark  # noqa: E402
from extractors_geo_spark.streaming.stateful import stateful_sessions  # noqa: E402


def gen_events(spark, out_dir: str, n: int, batches: int, users: int,
               gap_s: int = 60):
    """B parquet files of skewed events in event-time order: 10% of rows
    hit user 0; each user emits bursts separated by > gap so sessions
    keep closing (state must drain, not grow)."""
    per = n // batches
    rng = np.random.default_rng(42)
    for b in range(batches):
        uid = np.where(rng.random(per) < 0.10, 0,
                       rng.integers(1, users, per))
        # event time advances ~2 gaps per batch so watermarks move and
        # earlier bursts close via the event-time timeout
        base_ms = b * 2 * gap_s * 1000
        ts = base_ms + rng.integers(0, gap_s * 1000 // 2, per)
        df = spark.createDataFrame(
            [(int(t), int(u), float(v)) for t, u, v in
             zip(ts, uid, rng.random(per))],
            "ts_ms long, user_id long, value double",
        ).select(F.timestamp_millis("ts_ms").alias("ts"), "user_id",
                 "value")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"b{b:03d}.tmp"))
        # atomically surface one file per batch dir entry
        tmp = os.path.join(out_dir, f"b{b:03d}.tmp")
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        os.replace(os.path.join(tmp, part),
                   os.path.join(out_dir, f"b{b:03d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)


def run(events: int, batches: int, users: int) -> dict:
    spark = get_spark(app_name="session_bench", master="local[16]",
                      shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="session_bench_")
    events_dir = os.path.join(work, "events")
    os.makedirs(events_dir)
    try:
        gen_events(spark, events_dir, events, batches, users)
        stream = (spark.readStream
                  .schema("ts timestamp, user_id long, value double")
                  .option("maxFilesPerTrigger", 1).parquet(events_dir))
        sessions = stateful_sessions(stream, gap_seconds=60,
                                     watermark="30 seconds")
        q = (sessions.writeStream.format("memory")
             .queryName("sess_bench").outputMode("append")
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .start())
        q.processAllAvailable()
        prog = [json.loads(p.json) if isinstance(p.json, str) else p
                for p in q.recentProgress]
        per_batch_ms = []
        state_rows = []
        for p in prog:
            if p.get("numInputRows", 0) == 0:
                continue
            per_batch_ms.append(int(p["batchDuration"]))
            ops = p.get("stateOperators") or []
            state_rows.append(int(ops[0]["numRowsTotal"]) if ops else 0)
        closed = spark.table("sess_bench").count()
        q.stop()
        return {
            "events": events, "batches": batches, "users": users,
            "per_batch_ms": per_batch_ms,
            "state_rows_by_batch": state_rows,
            "max_state_rows": max(state_rows, default=0),
            "closed_sessions": int(closed),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main():
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    users = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    print(json.dumps(run(events, batches, users)))


if __name__ == "__main__":
    main()
