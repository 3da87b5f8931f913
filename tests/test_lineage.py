"""Per-partition lineage + checkpoint/resume (north rule requirement)."""

import json
import os

from pyspark.sql import functions as F

from extractors_geo_spark.streaming.lineage import LineageManifest, run_with_lineage


def test_full_run_then_resume_skips_everything(spark, tmp_path):
    df = spark.range(1000).select(F.col("id").cast("string").alias("key"), (F.col("id") * 2).alias("v"))
    out = str(tmp_path / "out")
    r1 = run_with_lineage(df, "key", out, n_buckets=8)
    assert sorted(r1["buckets_run"]) == list(range(8))
    assert r1["rows"] == 1000
    r2 = run_with_lineage(df, "key", out, n_buckets=8)
    assert r2["buckets_run"] == [] and sorted(r2["buckets_skipped"]) == list(range(8))
    assert r2["rows"] == 1000
    back = spark.read.parquet(out + "/bucket=*")
    assert back.count() == 1000


def test_partial_manifest_resumes_remaining(spark, tmp_path):
    df = spark.range(400).select(F.col("id").cast("string").alias("key"), F.col("id").alias("v"))
    out = str(tmp_path / "out2")
    full = run_with_lineage(df, "key", out, n_buckets=4)
    assert full["rows"] == 400
    # simulate a crash after 2 buckets: truncate the manifest
    mp = os.path.join(out, "_lineage.jsonl")
    lines = open(mp).read().strip().split("\n")
    with open(mp, "w") as f:
        f.write("\n".join(lines[:2]) + "\n")
    done = {json.loads(l)["bucket"] for l in lines[:2]}
    r = run_with_lineage(df, "key", out, n_buckets=4)
    assert set(r["buckets_skipped"]) == done
    assert set(r["buckets_run"]) == set(range(4)) - done
    assert spark.read.parquet(out + "/bucket=*").count() == 400


def test_transform_applied_per_bucket(spark, tmp_path):
    df = spark.range(100).select(F.col("id").cast("string").alias("key"), F.col("id").alias("v"))
    out = str(tmp_path / "out3")
    r = run_with_lineage(df, "key", out, n_buckets=2,
                         transform=lambda d: d.withColumn("v2", F.col("v") * 10))
    back = spark.read.parquet(out + "/bucket=*")
    assert back.filter(F.col("v2") != F.col("v") * 10).count() == 0
    assert r["rows"] == 100


def test_manifest_counters(spark, tmp_path):
    df = spark.range(100).select(F.col("id").cast("string").alias("key"))
    out = str(tmp_path / "out4")
    run_with_lineage(df, "key", out, n_buckets=4)
    m = LineageManifest(os.path.join(out, "_lineage.jsonl")).completed()
    assert len(m) == 4
    assert sum(rec["rows"] for rec in m.values()) == 100
    assert all(rec["seconds"] >= 0 for rec in m.values())
