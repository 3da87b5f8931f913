"""Per-partition lineage + checkpoint/resume (SURVEY.md ST1, §4.2 item 4).

The reference gets resume for free from RabbitMQ ack/redelivery (pyclowder
contract, consumed at preview.geotiff/ncsa.geo.tiff.py:145-152): a crashed
worker's message is redelivered; completed messages are never reprocessed.

The engine's equivalent: a job is split into B deterministic buckets by
key hash; each bucket's output is written to its own directory, and a
manifest line (bucket id, row count, wall time) is appended ONLY after the
bucket's write succeeds. On restart, buckets already in the manifest are
skipped — the job resumes mid-way with at-most-once reprocessing per
bucket and exactly-once output (bucket dirs are overwritten atomically).

Counters: per-bucket row counts live in the manifest — the per-partition
metrics the north rule asks for.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LineageManifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def completed(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        out[rec["bucket"]] = rec
        return out

    def mark(self, bucket: int, rows: int, seconds: float) -> None:
        rec = {"bucket": bucket, "rows": rows, "seconds": round(seconds, 3), "ts": time.time()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())


def run_with_lineage(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    n_buckets: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    manifest_path: str | None = None,
) -> dict:
    """Execute `transform(df)` bucket-by-bucket with resume.

    Each bucket filter is pushed into the scan (pmod(xxhash64(key), B) is
    deterministic), so a resumed run re-reads only unfinished buckets.
    Returns {'buckets_run': [...], 'buckets_skipped': [...], 'rows': N}.
    """
    manifest = LineageManifest(manifest_path or os.path.join(out_dir, "_lineage.jsonl"))
    done = manifest.completed()
    bucket_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    ran, skipped, total = [], [], 0
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            total += done[b]["rows"]
            continue
        t0 = time.time()
        part = df.filter(bucket_expr == b)
        out = transform(part) if transform else part
        path = os.path.join(out_dir, f"bucket={b}")
        out.write.mode("overwrite").parquet(path)
        n = out.sparkSession.read.parquet(path).count()
        manifest.mark(b, n, time.time() - t0)
        ran.append(b)
        total += n
    return {"buckets_run": ran, "buckets_skipped": skipped, "rows": total}
