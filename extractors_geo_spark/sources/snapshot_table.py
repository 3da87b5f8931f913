"""Iceberg-layout table on plain parquet: snapshot manifests + time travel.

The sandbox has no Iceberg runtime, so the engine keeps the PARTS of
Iceberg the reference semantics need — immutable data files, named
snapshots, atomic latest-pointer, MERGE/DELETE as new snapshots, time
travel / rollback — behind a small manifest format, with the writer
interface isolated so a real Iceberg catalog can replace it wholesale
(SURVEY.md §7 "what's hard" item 5).

Layout:
    <root>/data/<snapshot>-<uuid>/part-*.parquet   (immutable)
    <root>/snapshots/v{N:06d}.json                 (file list + meta)
    <root>/VERSION                                 (latest N, atomic rename)

Semantics:
  * append      — new files + snapshot listing old files + new
  * overwrite   — new files + snapshot listing only the new
  * merge       — latest-wins upsert (catalog.upsert) materialized as an
                  overwrite snapshot (Iceberg MERGE INTO analog)
  * delete      — anti-join materialized as an overwrite snapshot
  * read(version=k) — time travel; rollback(k) — re-point latest
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators import catalog as _catalog


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
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
            return json.load(f)

    def _write_files(self, df: DataFrame, v: int) -> list[str]:
        d = os.path.join(self.root, "data", f"{v:06d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(d)
        return [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]

    def _commit(self, files: list[str], operation: str, summary: dict | None = None) -> int:
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

    # ------------------------------------------------------------ operations
    def read(self, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        if not snap["files"]:
            raise ValueError("empty table")
        return self.spark.read.parquet(*snap["files"])

    def append(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        new_files = self._write_files(df, v)
        return self._commit(self.snapshot()["files"] + new_files, "append",
                            {"added_files": len(new_files)})

    def overwrite(self, df: DataFrame) -> int:
        v = self.current_version() + 1
        files = self._write_files(df, v)
        return self._commit(files, "overwrite", {"files": len(files)})

    def merge(self, updates: DataFrame, key: str, order_col: str) -> int:
        """MERGE INTO: latest-wins upsert (Iceberg MERGE analog)."""
        try:
            current = self.read()
            merged = _catalog.upsert(current, updates, key=key, order_col=order_col)
        except ValueError:
            merged = updates
        v = self.current_version() + 1
        files = self._write_files(merged, v)
        return self._commit(files, "merge", {"key": key})

    def delete_keys(self, keys: DataFrame, key: str) -> int:
        """DELETE WHERE key IN (...) — the file.removed path (J3/K6)."""
        kept = _catalog.delete(self.read(), keys, key=key)
        v = self.current_version() + 1
        files = self._write_files(kept, v)
        return self._commit(files, "delete", {"key": key})

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
