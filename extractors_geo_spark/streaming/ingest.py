"""Streaming ingest with watermarked windowed aggregation (SURVEY.md ST3).

The reference consumes events one at a time with no late-data story; the
engine's streaming ingest adds the standard Structured-Streaming shape:
event stream -> watermark -> tumbling-window per-activity counts (the
per-minute extractor-health counters an operator of the reference fleet
would scrape from RabbitMQ instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import EVENT_SCHEMA


def event_stream(spark: SparkSession, events_dir: str, files_per_trigger: int = 16) -> DataFrame:
    """files_per_trigger bounds the micro-batch; append-mode windowed aggs
    only emit when the watermark advances BETWEEN batches, so a stream
    drained in one giant batch flushes nothing."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(events_dir)
    )


def windowed_activity_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window counts per activity with late-data watermark.
    State is bounded: windows older than the watermark are evicted."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("win"), F.col("activity"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "activity", "n",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    files_per_trigger: int = 16,
):
    """availableNow batch-drain of the stream into a parquet sink."""
    agg = windowed_activity_counts(
        event_stream(spark, events_dir, files_per_trigger), window, watermark
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
