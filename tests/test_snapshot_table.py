"""Iceberg-layout snapshot table: append/overwrite/merge/delete/time travel."""

import datetime

import pytest
from pyspark.sql import functions as F

from extractors_geo_spark.sources.snapshot_table import SnapshotTable


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def test_append_and_read(spark, table):
    df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    v1 = table.append(df1)
    assert v1 == 1 and table.read().count() == 2
    v2 = table.append(spark.createDataFrame([("c", 3)], ["k", "v"]))
    assert v2 == 2 and table.read().count() == 3
    # time travel
    assert table.read(version=1).count() == 2


def test_merge_latest_wins(spark, table):
    table.append(spark.createDataFrame(
        [("a", "old", _ts("2024-01-01")), ("b", "keep", _ts("2024-01-01"))],
        ["k", "v", "updated_at"]))
    table.merge(spark.createDataFrame(
        [("a", "new", _ts("2024-02-01")), ("c", "ins", _ts("2024-02-01"))],
        ["k", "v", "updated_at"]), key="k", order_col="updated_at")
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {"a": "new", "b": "keep", "c": "ins"}
    # previous snapshot untouched
    old = {r["k"]: r["v"] for r in table.read(version=1).collect()}
    assert old == {"a": "old", "b": "keep"}


def test_delete_and_rollback(spark, table):
    table.append(spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], ["k", "v"]))
    table.delete_keys(spark.createDataFrame([("b",)], ["k"]), key="k")
    assert {r["k"] for r in table.read().collect()} == {"a", "c"}
    table.rollback(1)
    assert {r["k"] for r in table.read().collect()} == {"a", "b", "c"}


def test_history(spark, table):
    table.append(spark.createDataFrame([("a", 1)], ["k", "v"]))
    table.overwrite(spark.createDataFrame([("b", 2)], ["k", "v"]))
    ops = [h["operation"] for h in table.history()]
    assert ops == ["append", "overwrite"]


def test_merge_into_empty(spark, table):
    table.merge(spark.createDataFrame([("a", 1, _ts("2024-01-01"))], ["k", "v", "updated_at"]),
                key="k", order_col="updated_at")
    assert table.read().count() == 1
