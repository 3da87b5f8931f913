"""MoR vs CoW delete cost + read overhead (VERDICT r5 #7).

Builds a bucketed SnapshotTable, then measures, for K successive
delete batches:
  - commit wall time per batch (CoW rewrite vs MoR delete-file write)
  - full-scan read wall time with k pending delete files (k = 0..K)
  - read wall time after apply_deletes() folds them back

Usage: python tools/mor_bench.py [rows] [batches] [batch_keys]
Prints one JSON line; numbers go to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from extractors_geo_spark.session import get_spark  # noqa: E402
from extractors_geo_spark.sources.snapshot_table import SnapshotTable  # noqa: E402


def build(spark, root, rows):
    t = SnapshotTable(spark, root, bucket_key="k", n_buckets=16,
                      delete_compact_threshold=0)  # manual maintenance here
    df = (spark.range(rows)
          .select(F.concat(F.lit("k"), F.col("id")).alias("k"),
                  F.col("id").alias("v"),
                  F.sha2(F.col("id").cast("string"), 256).alias("payload")))
    t.overwrite(df)
    return t


def timed_read(t):
    t0 = time.time()
    n = t.read().count()
    return round(time.time() - t0, 3), n


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    spark = get_spark(app_name="mor_bench", master="local[16]",
                      shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="mor_bench_")
    out = {"rows": rows, "batches": batches, "batch_keys": batch_keys}
    try:
        for mode in ("cow", "mor"):
            t = build(spark, os.path.join(work, mode), rows)
            timed_read(t)  # warm
            commit_s, read_s = [], []
            read_s.append(timed_read(t)[0])  # 0 pending deletes
            for b in range(batches):
                keys = (spark.range(b * batch_keys, (b + 1) * batch_keys)
                        .select(F.concat(F.lit("k"), F.col("id") * 97 % rows)
                                .alias("k")))
                t0 = time.time()
                t.delete_keys(keys, key="k", mode=mode)
                commit_s.append(round(time.time() - t0, 3))
                read_s.append(timed_read(t)[0])
            entry = {"commit_s": commit_s, "read_s_by_pending": read_s}
            if mode == "mor":
                t0 = time.time()
                t.apply_deletes()
                entry["apply_deletes_s"] = round(time.time() - t0, 3)
                entry["read_after_fold_s"] = timed_read(t)[0]
                entry["pending_after_fold"] = len(t.snapshot()["deletes"])
            out[mode] = entry
        # r7 (VERDICT r06 #3): delete-file pruning — batches confined to
        # ONE bucket; reads should pay ~one bucket's anti-join, not one
        # per pending delete file
        t = build(spark, os.path.join(work, "mor_hot"), rows)
        timed_read(t)  # warm
        cand = (spark.range(rows)
                .select(F.concat(F.lit("k"), F.col("id")).alias("k"),
                        F.col("id").alias("id"))
                .filter(F.pmod(F.xxhash64(F.col("k")), F.lit(16)) == 3))
        hot_reads = [timed_read(t)[0]]
        for b in range(batches):
            keys = (cand.filter(F.col("id") % batches == b)
                    .limit(batch_keys).select("k"))
            t.delete_keys(keys, key="k", mode="mor")
            hot_reads.append(timed_read(t)[0])
        out["mor_hot_bucket"] = {"read_s_by_pending": hot_reads,
                                 "pending": len(t.snapshot()["deletes"])}
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
