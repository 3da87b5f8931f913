"""Structured-Streaming removal propagation (SURVEY.md ST2)."""

import datetime

from pyspark.sql import functions as F

from extractors_geo_spark.datagen import EVENT_SCHEMA
from extractors_geo_spark.streaming import removal


def test_propagate_removals(spark, tmp_path):
    derived = str(tmp_path / "derived")
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(f"i{k}", k) for k in range(20)], ["image_id", "v"]
    ).write.parquet(derived)

    ts = datetime.datetime(2024, 1, 2)
    spark.createDataFrame(
        [("i1", "removed", ts), ("i5", "removed", ts), ("i7", "added", ts)],
        EVENT_SCHEMA,
    ).write.parquet(events_dir)

    q = removal.propagate_removals(spark, events_dir, derived, ckpt)
    q.awaitTermination(120)

    left = {r["image_id"] for r in spark.read.parquet(derived).collect()}
    assert left == {f"i{k}" for k in range(20)} - {"i1", "i5"}


def test_propagate_removals_idempotent_second_batch(spark, tmp_path):
    derived = str(tmp_path / "derived")
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(f"i{k}", k) for k in range(10)], ["image_id", "v"]).write.parquet(derived)
    ts = datetime.datetime(2024, 1, 2)
    spark.createDataFrame([("i3", "removed", ts)], EVENT_SCHEMA).write.parquet(events_dir)

    q = removal.propagate_removals(spark, events_dir, derived, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(derived).count() == 9

    # new events arrive; restart with the same checkpoint only processes the delta
    spark.createDataFrame([("i4", "removed", ts)], EVENT_SCHEMA).write.mode("append").parquet(events_dir)
    q2 = removal.propagate_removals(spark, events_dir, derived, ckpt)
    q2.awaitTermination(120)
    left = {r["image_id"] for r in spark.read.parquet(derived).collect()}
    assert left == {f"i{k}" for k in range(10)} - {"i3", "i4"}
