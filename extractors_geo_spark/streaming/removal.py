"""Streaming removal propagation — the file.removed path as Structured
Streaming (SURVEY.md ST2).

The reference tears down derived artifacts when a 'removed' activity
arrives (preview.geotiff/ncsa.geo.tiff.py:41-66, layer+store delete at
:154-170). Here: an append-only event stream is read with readStream;
each micro-batch applies MERGE-DELETE to the derived tables via
foreachBatch (idempotent: deletes are keyed anti-joins, re-running a batch
is a no-op).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import EVENT_SCHEMA
from ..operators import catalog as _catalog


def removal_stream(spark: SparkSession, events_dir: str):
    """File-source stream of event rows (image_id, activity, ts)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
    )


def propagate_removals(
    spark: SparkSession,
    events_dir: str,
    derived_path: str,
    checkpoint_dir: str,
    key: str = "image_id",
):
    """Start a stream that rewrites `derived_path` minus removed keys on
    each micro-batch. Returns the StreamingQuery (caller awaits/stops).

    Watermarking isn't needed for deletes (late 'removed' events still
    delete — removal is monotone); a re-add after removal is handled by
    the batch apply_removals (last-event-wins) when tables are rebuilt."""
    stream = removal_stream(spark, events_dir)

    def on_batch(batch: DataFrame, batch_id: int) -> None:
        removed = batch.filter(F.col("activity") == "removed").select(key).distinct()
        if removed.isEmpty():
            return
        current = spark.read.parquet(derived_path)
        kept = _catalog.delete(current, removed, key=key)
        tmp = derived_path.rstrip("/") + f"._tmp_batch{batch_id}"
        kept.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(derived_path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
