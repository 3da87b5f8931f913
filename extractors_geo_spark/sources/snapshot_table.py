"""Iceberg-layout table on plain parquet: snapshot manifests + time travel.

The sandbox has no Iceberg runtime, so the engine keeps the PARTS of
Iceberg the reference semantics need — immutable data files, named
snapshots, atomic latest-pointer, MERGE/DELETE as new snapshots, time
travel / rollback — behind a small manifest format, with the writer
interface isolated so a real Iceberg catalog can replace it wholesale
(SURVEY.md §7 "what's hard" item 5).

Layout:
    <root>/data/<snapshot>-<uuid>/_bucket=K/part-*.parquet   (immutable)
    <root>/snapshots/v{N:06d}.json                 (file list + stats)
    <root>/VERSION                                 (latest N, atomic rename)

Manifest entries are per-file dicts {path, bucket, min_key, max_key,
rows}: data files are bucketed by xxhash64(key) % n_buckets and carry
min/max key stats read from the parquet footer (exactly how Iceberg
manifests are built). MERGE/DELETE rewrite ONLY the files whose bucket
contains a touched key (min/max-pruned within the bucket when the
update batch is small); every other file is carried into the new
snapshot BY REFERENCE — the 100 TB property: a 100-row upsert against
a billion-row table rewrites a handful of buckets, not the table.

Semantics:
  * append      — new files + snapshot listing old files + new
  * overwrite   — new files + snapshot listing only the new
  * merge       — latest-wins upsert (catalog.upsert) over touched
                  buckets only (Iceberg MERGE INTO analog)
  * delete      — anti-join over touched buckets only
  * read(version=k) — time travel; rollback(k) — re-point latest
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import catalog as _catalog

# collect delete/update keys to the driver for min/max file pruning only
# below this cardinality; above it, prune by bucket alone (still 1/n_buckets
# of the table for a skew-free key).
_KEY_PRUNE_CAP = 100_000


def _norm_key(v):
    """Canonical, JSON-serializable, order-preserving key image (stats from
    parquet footers and keys collected from Spark must compare equal).

    Returns None for any non-primitive value: Spark collect() yields
    bytearray for binary keys while parquet footers yield bytes, so a
    str() fallback would compare mismatched string images
    ("bytearray(b'..')" vs "b'..'") and could WRONGLY PRUNE a file that
    contains a touched key. None disables min/max pruning for that value
    — bucket pruning still applies."""
    if isinstance(v, bool):
        return int(v)
    if v is None or isinstance(v, (int, float, str)):
        return v
    return None


def _prunable(a, b) -> bool:
    """True iff a and b live in the same total order (str vs str, or
    number vs number) — the only cases where a bisect range check between
    collected keys and footer stats is sound."""
    num = (int, float)
    return (isinstance(a, str) and isinstance(b, str)) or (
        isinstance(a, num) and isinstance(b, num)
    )


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str,
                 bucket_key: str | None = None, n_buckets: int = 16):
        self.spark = spark
        self.root = root
        self.bucket_key = bucket_key
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ------------------------------------------------------------- plumbing
    def _version_path(self) -> str:
        return os.path.join(self.root, "VERSION")

    def current_version(self) -> int:
        try:
            with open(self._version_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _snapshot_path(self, v: int) -> str:
        return os.path.join(self.root, "snapshots", f"v{v:06d}.json")

    def snapshot(self, v: int | None = None) -> dict:
        v = v or self.current_version()
        if v == 0:
            return {"version": 0, "files": [], "operation": "empty", "ts": 0}
        with open(self._snapshot_path(v)) as f:
            snap = json.load(f)
        # tolerate legacy manifests that listed bare path strings
        snap["files"] = [
            f if isinstance(f, dict) else {"path": f, "bucket": None,
                                           "min_key": None, "max_key": None, "rows": None}
            for f in snap["files"]
        ]
        return snap

    def _bucket_expr(self, key: str):
        return F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(self.n_buckets))

    def _file_stats(self, path: str, key: str | None) -> dict:
        """min/max of the key column + row count from the parquet footer —
        a driver-side metadata read, never a data scan."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        out = {"rows": md.num_rows, "min_key": None, "max_key": None}
        if key is None:
            return out
        try:
            ki = md.schema.names.index(key)
        except ValueError:
            return out
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ki).statistics
            if st is None or not st.has_min_max:
                return out
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out["min_key"] = _norm_key(min(mins))
            out["max_key"] = _norm_key(max(maxs))
        return out

    def _write_files(self, df: DataFrame, v: int) -> list[dict]:
        """Write df as immutable data files; bucketed by key when the table
        has a bucket_key (one hive dir per bucket so the file->bucket map is
        exact), flat otherwise. Returns manifest entries with footer stats."""
        d = os.path.join(self.root, "data", f"{v:06d}-{uuid.uuid4().hex[:8]}")
        key = self.bucket_key
        targets: list[tuple[str, int | None]] = []  # (path, bucket)
        if key is not None:
            (df.withColumn("_bucket", self._bucket_expr(key))
               .repartition("_bucket")
               .write.partitionBy("_bucket").mode("overwrite").parquet(d))
            for bdir in sorted(os.listdir(d)):
                if not bdir.startswith("_bucket="):
                    continue
                b = int(bdir.split("=", 1)[1])
                for f in sorted(os.listdir(os.path.join(d, bdir))):
                    if f.endswith(".parquet"):
                        targets.append((os.path.join(d, bdir, f), b))
        else:
            df.write.mode("overwrite").parquet(d)
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    targets.append((os.path.join(d, f), None))
        # footer reads are independent metadata fetches; a serial loop
        # serializes the commit path at 10^5+ files per commit (VERDICT r02)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, max(4, len(targets)))) as ex:
            stats = list(ex.map(lambda t: self._file_stats(t[0], key), targets))
        return [
            {"path": p, "bucket": b, **st} for (p, b), st in zip(targets, stats)
        ]

    def _commit(self, files: list[dict], operation: str, summary: dict | None = None) -> int:
        v = self.current_version() + 1
        snap = {"version": v, "files": files, "operation": operation,
                "ts": time.time(), "summary": summary or {}}
        with open(self._snapshot_path(v), "w") as f:
            json.dump(snap, f)
        tmp = self._version_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._version_path())  # atomic latest pointer
        return v

    # --------------------------------------------------------- file pruning
    def _touched_split(self, key_df: DataFrame, key: str) -> tuple[list[dict], list[dict], dict]:
        """Split current files into (touched, carried) for a batch of keys.
        Bucket pruning always applies; min/max file pruning applies when the
        key batch is small enough to collect."""
        buckets = {
            r["b"] for r in
            key_df.select(self._bucket_expr(key).alias("b")).distinct().collect()
        }
        rows = key_df.select(key).distinct().limit(_KEY_PRUNE_CAP + 1).collect()
        keys_sorted = None
        if len(rows) <= _KEY_PRUNE_CAP:
            norm = {_norm_key(r[0]) for r in rows}
            if None not in norm:
                try:
                    keys_sorted = sorted(norm)
                except TypeError:  # mixed str/number key batch: no total order
                    keys_sorted = None
        touched, carried = [], []
        import bisect

        for f in self.snapshot()["files"]:
            hit = f["bucket"] is None or f["bucket"] in buckets
            if hit and keys_sorted is not None and f["min_key"] is not None:
                # native-key-space range check, only when both sides provably
                # share a total order — pruning must never skip a file it
                # can't prove (ADVICE r02: binary keys str()-normalized
                # differently on the two sides and wrongly pruned)
                fmin, fmax = _norm_key(f["min_key"]), _norm_key(f["max_key"])
                if (
                    fmin is not None
                    and fmax is not None
                    and _prunable(keys_sorted[0], fmin)
                    and _prunable(keys_sorted[0], fmax)
                ):
                    lo = bisect.bisect_left(keys_sorted, fmin)
                    hit = lo < len(keys_sorted) and keys_sorted[lo] <= fmax
            (touched if hit else carried).append(f)
        stats = {"files_total": len(touched) + len(carried),
                 "files_rewritten": len(touched), "files_carried": len(carried),
                 "buckets_touched": sorted(buckets)}
        return touched, carried, stats

    # ------------------------------------------------------------ operations
    def read(self, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        if not snap["files"]:
            raise ValueError("empty table")
        return self.spark.read.parquet(*[f["path"] for f in snap["files"]])

    def append(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        new_files = self._write_files(df, v)
        return self._commit(self.snapshot()["files"] + new_files, "append",
                            {"added_files": len(new_files)})

    def overwrite(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        files = self._write_files(df, v)
        return self._commit(files, "overwrite", {"files": len(files)})

    def merge(self, updates: DataFrame, key: str, order_col: str,
              summary_extra: dict | None = None) -> int:
        """MERGE INTO: latest-wins upsert (Iceberg MERGE analog). With a
        bucket_key, only files in buckets containing updated keys are
        rewritten; the rest carry by reference."""
        if self.bucket_key is None or self.current_version() == 0:
            try:
                current = self.read()
                merged = _catalog.upsert(current, updates, key=key, order_col=order_col)
            except ValueError:
                merged = updates
            v = self.current_version() + 1
            files = self._write_files(merged, v)
            return self._commit(files, "merge", {"key": key, **(summary_extra or {})})
        assert key == self.bucket_key, "merge key must match table bucket_key"
        touched, carried, stats = self._touched_split(updates, key)
        if touched:
            current_touched = self.spark.read.parquet(*[f["path"] for f in touched])
            merged = _catalog.upsert(current_touched, updates, key=key, order_col=order_col)
        else:
            merged = updates
        v = self.current_version() + 1
        new_files = self._write_files(merged, v)
        return self._commit(carried + new_files, "merge",
                            {"key": key, **stats, **(summary_extra or {})})

    def delete_keys(self, keys: DataFrame, key: str,
                    summary_extra: dict | None = None) -> int:
        """DELETE WHERE key IN (...) — the file.removed path (J3/K6). With a
        bucket_key, anti-joins and rewrites only the touched buckets."""
        if self.bucket_key is None:
            kept = _catalog.delete(self.read(), keys, key=key)
            v = self.current_version() + 1
            files = self._write_files(kept, v)
            return self._commit(files, "delete", {"key": key, **(summary_extra or {})})
        assert key == self.bucket_key, "delete key must match table bucket_key"
        touched, carried, stats = self._touched_split(keys, key)
        new_files: list[dict] = []
        if touched:
            current_touched = self.spark.read.parquet(*[f["path"] for f in touched])
            kept = _catalog.delete(current_touched, keys, key=key)
            v = self.current_version() + 1
            new_files = self._write_files(kept, v)
        return self._commit(carried + new_files, "delete",
                            {"key": key, **stats, **(summary_extra or {})})

    def rollback(self, version: int) -> None:
        if not os.path.exists(self._snapshot_path(version)):
            raise ValueError(f"no snapshot v{version}")
        tmp = self._version_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._version_path())

    def history(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(os.path.join(self.root, "snapshots"))):
            with open(os.path.join(self.root, "snapshots", f)) as fh:
                s = json.load(fh)
            out.append({k: s[k] for k in ("version", "operation", "ts")})
        return out

    def compact(self, target_rows_per_file: int = 1_000_000) -> int:
        """Iceberg rewrite_data_files analog: merge buckets fragmented
        into many small files back into one generation. A long-lived
        MERGE/DELETE stream leaves each touched bucket with a file per
        commit; reads then pay per-file open cost and min/max pruning
        loses power (many overlapping ranges). Commits a new
        snapshot; pair with expire_snapshots to reclaim the old files.

        Binpack semantics: within a bucket, only the SMALL files (under
        target_rows_per_file) merge when there are at least two of them;
        already-large files always carry by reference — rewriting a 10M-row
        file to absorb a 100-row neighbor would be write amplification."""
        snap = self.snapshot()
        if not snap["files"]:
            raise ValueError("empty table")
        by_bucket: dict = {}
        for f in snap["files"]:
            by_bucket.setdefault(f["bucket"], []).append(f)
        rewrite, carried = [], []
        for b, fs in by_bucket.items():
            small = [f for f in fs if (f["rows"] or 0) < target_rows_per_file]
            if len(small) > 1:
                rewrite.extend(small)
                carried.extend(f for f in fs if f not in small)
            else:
                carried.extend(fs)
        if not rewrite:
            return self.current_version()
        df = self.spark.read.parquet(*[f["path"] for f in rewrite])
        v = self.current_version() + 1
        new_files = self._write_files(df, v)
        return self._commit(
            carried + new_files, "compact",
            {"files_before": len(rewrite), "files_after": len(new_files),
             "files_carried": len(carried)},
        )

    def expire_snapshots(self, retain_last: int = 5) -> dict:
        """Iceberg expire_snapshots analog: drop snapshot manifests older
        than the newest `retain_last` and delete data files no retained
        snapshot references. Without this a long-lived removal stream
        accumulates one snapshot + one file generation per batch forever
        (VERDICT r02 'what's missing' #5).

        Time travel remains valid for retained versions; expired versions
        raise on read. Safe against concurrent readers OF RETAINED
        versions only — like Iceberg, expiry assumes no reader is pinned
        to an expired snapshot."""
        retain_last = max(1, retain_last)
        current = self.current_version()
        snap_dir = os.path.join(self.root, "snapshots")
        versions = sorted(
            int(f[1:7]) for f in os.listdir(snap_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        keep = set(versions[-retain_last:])
        keep.add(current)  # never expire the live pointer
        live_files: set[str] = set()
        for v in keep:
            if v == 0:
                continue
            live_files.update(f["path"] for f in self.snapshot(v)["files"])
        expired = [v for v in versions if v not in keep]
        removed_files = 0
        for v in expired:
            for f in self.snapshot(v)["files"]:
                p = f["path"]
                if p not in live_files and os.path.exists(p):
                    os.remove(p)
                    removed_files += 1
            os.remove(self._snapshot_path(v))
        # reclaim whole data generations with no surviving references
        # (rmtree, not rmdir: Spark leaves _SUCCESS/.crc markers behind)
        import shutil

        data_root = os.path.join(self.root, "data")
        for gen in sorted(os.listdir(data_root)):
            gdir = os.path.join(data_root, gen)
            if not any(p.startswith(gdir + os.sep) for p in live_files):
                shutil.rmtree(gdir, ignore_errors=True)
        return {"expired_versions": expired, "removed_files": removed_files,
                "retained": sorted(keep)}
