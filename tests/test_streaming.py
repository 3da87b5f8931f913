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


def test_windowed_activity_counts(spark, tmp_path):
    """ST3: watermarked tumbling-window counts over the event stream."""
    import datetime

    from extractors_geo_spark.streaming import ingest

    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    # one file per minute so multi-batch processing advances the watermark
    for m in range(5):
        rows = [(f"i{m}_{k}", "added", base + datetime.timedelta(minutes=m, seconds=k * 10))
                for k in range(3)]
        if m == 1:
            rows.append(("late", "removed", base + datetime.timedelta(minutes=1, seconds=30)))
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(events_dir)

    q = ingest.run_windowed_counts(spark, events_dir, out, ckpt, files_per_trigger=1)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    added = {(r["win_start"].minute, r["n"]) for r in got.filter(F.col("activity") == "added").collect()}
    # append mode emits only windows the final watermark (max_ts - 2min =
    # minute 2) has closed: windows [0,1) and [1,2)
    assert {(0, 3), (1, 3)}.issubset(added)
    assert all(n == 3 for (_, n) in added)
    rem = got.filter(F.col("activity") == "removed").collect()
    assert all(r["n"] == 1 for r in rem)


def test_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: each image_id emitted at most once across
    micro-batches (cross-batch dedup, ST1/ST2 idempotency)."""
    import datetime

    from extractors_geo_spark.streaming import stateful

    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    ts = datetime.datetime(2024, 1, 2)
    # two files; duplicates within and across
    spark.createDataFrame(
        [("a", "added", ts), ("b", "added", ts), ("a", "added", ts)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(events_dir)
    spark.createDataFrame(
        [("b", "added", ts), ("c", "added", ts)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(events_dir)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(events_dir)
    )
    q = (
        stateful.stateful_dedup(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    ids = [r["image_id"] for r in rows]
    assert sorted(ids) == ["a", "b", "c"]  # exactly once each


def test_running_counters(spark, tmp_path):
    import datetime

    from extractors_geo_spark.streaming import stateful

    events_dir = str(tmp_path / "ev")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    ts = datetime.datetime(2024, 1, 2)
    spark.createDataFrame(
        [("a", "added", ts), ("b", "added", ts), ("c", "removed", ts)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(events_dir)
    spark.createDataFrame(
        [("d", "added", ts)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(events_dir)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(events_dir)
    )
    q = (
        stateful.running_counters(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    added_totals = sorted(r["total_events"] for r in rows if r["activity"] == "added")
    assert added_totals[-1] == 3  # running total reached 3 across batches
