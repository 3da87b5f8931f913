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


def _paths(snap):
    return {f["path"] for f in snap["files"]}


def test_bucketed_merge_rewrites_only_touched_files(spark, tmp_path):
    import hashlib

    t = SnapshotTable(spark, str(tmp_path / "btbl"), bucket_key="k", n_buckets=8)
    base = spark.createDataFrame(
        [(f"key{i:04d}", f"v{i}", _ts("2024-01-01")) for i in range(400)],
        ["k", "v", "updated_at"])
    t.overwrite(base)
    snap1 = t.snapshot()
    before = {f["path"]: hashlib.md5(open(f["path"], "rb").read()).hexdigest()
              for f in snap1["files"]}
    assert all(f["bucket"] is not None and f["min_key"] is not None for f in snap1["files"])

    v = t.merge(spark.createDataFrame(
        [("key0001", "NEW", _ts("2024-02-01")), ("brand_new", "INS", _ts("2024-02-01"))],
        ["k", "v", "updated_at"]), key="k", order_col="updated_at")
    snap2 = t.snapshot(v)
    carried = _paths(snap2) & _paths(snap1)
    # most files carried by reference, byte-identical
    assert snap2["summary"]["files_carried"] >= 6
    assert snap2["summary"]["files_rewritten"] <= 2
    for p in carried:
        assert hashlib.md5(open(p, "rb").read()).hexdigest() == before[p]
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got["key0001"] == "NEW" and got["brand_new"] == "INS" and got["key0002"] == "v2"
    assert len(got) == 401
    # time travel still sees the pre-merge table
    assert {r["k"]: r["v"] for r in t.read(version=1).collect()}["key0001"] == "v1"


def test_bucketed_delete_prunes_untouched_buckets(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "dtbl"), bucket_key="k", n_buckets=8)
    t.overwrite(spark.createDataFrame([(f"key{i:04d}", i) for i in range(400)], ["k", "v"]))
    snap1 = t.snapshot()
    v = t.delete_keys(spark.createDataFrame([("key0007",), ("key0123",)], ["k"]), key="k")
    snap2 = t.snapshot(v)
    assert snap2["summary"]["files_carried"] >= 5
    assert _paths(snap2) & _paths(snap1)  # carried by reference
    keys = {r["k"] for r in t.read().collect()}
    assert len(keys) == 398 and "key0007" not in keys and "key0123" not in keys


def test_minmax_prune_skips_disjoint_files(spark, tmp_path):
    # two keys in the SAME bucket but different files: min/max stats prune
    # the file whose range can't contain the update key
    t = SnapshotTable(spark, str(tmp_path / "mtbl"), bucket_key="k", n_buckets=1)
    t.append(spark.createDataFrame([("aaa", 1), ("abb", 2)], ["k", "v"]))
    t.append(spark.createDataFrame([("zzz", 3), ("zyy", 4)], ["k", "v"]))
    v = t.delete_keys(spark.createDataFrame([("zzz",)], ["k"]), key="k")
    snap = t.snapshot(v)
    assert snap["summary"]["files_rewritten"] == 1
    assert {r["k"] for r in t.read().collect()} == {"aaa", "abb", "zyy"}


def test_binary_key_never_wrongly_pruned(spark, tmp_path):
    # ADVICE r02: collected binary keys (bytearray) and footer stats (bytes)
    # str()-normalized to different images, so the range check could prune a
    # file that contains the touched key. Binary keys must disable min/max
    # pruning (bucket pruning still applies) and the delete must land.
    t = SnapshotTable(spark, str(tmp_path / "btbl"), bucket_key="k", n_buckets=1)
    rows = [(bytes([i, i + 1, i + 2]), i) for i in range(30)]
    t.append(spark.createDataFrame(rows, "k binary, v int"))
    t.append(spark.createDataFrame([(bytes([200, 201, 202]), 99)], "k binary, v int"))
    victim = bytes([5, 6, 7])
    t.delete_keys(spark.createDataFrame([(victim,)], "k binary"), key="k")
    left = {bytes(r["k"]) for r in t.read().collect()}
    assert victim not in left and len(left) == 30


def test_expire_snapshots_reclaims_files(spark, tmp_path):
    import os

    t = SnapshotTable(spark, str(tmp_path / "gtbl"), bucket_key="k", n_buckets=4)
    t.overwrite(spark.createDataFrame([(f"key{i:03d}", i) for i in range(64)], ["k", "v"]))
    for i in range(8):
        t.delete_keys(spark.createDataFrame([(f"key{i:03d}",)], ["k"]), key="k")
    assert t.current_version() == 9
    gens_before = len(os.listdir(os.path.join(t.root, "data")))
    res = t.expire_snapshots(retain_last=2)
    assert res["expired_versions"] == list(range(1, 8))
    # retained versions still read correctly (time travel intact)
    assert t.read().count() == 56
    assert t.read(version=8).count() == 57
    # expired manifests are gone
    assert len(t.history()) == 2
    # some data generations were reclaimed on disk
    gens_after = len(os.listdir(os.path.join(t.root, "data")))
    assert gens_after < gens_before
    # every file referenced by retained snapshots still exists
    for v in (8, 9):
        for f in t.snapshot(v)["files"]:
            assert os.path.exists(f["path"])


def test_merge_on_read_delete_and_sequence_semantics(spark, tmp_path):
    """mode='mor' deletes write equality-delete files (no data rewrite);
    reads apply them seq-aware, so a key re-inserted AFTER the delete
    survives (Iceberg v2 sequence-number semantics)."""
    t = SnapshotTable(spark, str(tmp_path / "mtbl"), bucket_key="k", n_buckets=4)
    t.overwrite(spark.createDataFrame([(f"k{i}", i) for i in range(20)], ["k", "v"]))
    files_v1 = {f["path"] for f in t.snapshot()["files"]}
    t.delete_keys(spark.createDataFrame([("k3",), ("k7",)], ["k"]), key="k",
                  mode="mor")
    snap = t.snapshot()
    # no data file rewritten, delete files recorded
    assert {f["path"] for f in snap["files"]} == files_v1
    assert snap["operation"] == "delete-mor" and len(snap["deletes"]) >= 1
    got = {r["k"] for r in t.read().collect()}
    assert got == {f"k{i}" for i in range(20)} - {"k3", "k7"}
    # time travel to before the delete still sees everything
    assert t.read(version=1).count() == 20
    # re-insert k3 AFTER the delete: newer seq -> must survive
    t.append(spark.createDataFrame([("k3", 99)], ["k", "v"]))
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows["k3"] == 99 and "k7" not in rows


def test_apply_deletes_folds_and_drops_delete_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "atbl"), bucket_key="k", n_buckets=4)
    t.overwrite(spark.createDataFrame([(f"k{i}", i) for i in range(16)], ["k", "v"]))
    t.delete_keys(spark.createDataFrame([("k1",), ("k5",)], ["k"]), key="k",
                  mode="mor")
    want = {r["k"] for r in t.read().collect()}
    v = t.apply_deletes()
    snap = t.snapshot(v)
    assert snap["operation"] == "apply_deletes" and snap["deletes"] == []
    assert {r["k"] for r in t.read().collect()} == want
    # idempotent: nothing pending -> no new snapshot
    assert t.apply_deletes() == v


def test_mor_composes_with_merge_and_compact(spark, tmp_path):
    """A rewrite path (merge/compact) must not resurrect MoR-deleted rows."""
    t = SnapshotTable(spark, str(tmp_path / "ctbl2"), bucket_key="k", n_buckets=2)
    t.overwrite(spark.createDataFrame(
        [(f"k{i}", i, 1) for i in range(10)], ["k", "v", "ts"]))
    t.delete_keys(spark.createDataFrame([("k2",), ("k8",)], ["k"]), key="k",
                  mode="mor")
    # merge an update to k0 (rewrites k0's bucket, which may hold k2/k8)
    t.merge(spark.createDataFrame([("k0", 100, 2)], ["k", "v", "ts"]),
            key="k", order_col="ts")
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows["k0"] == 100 and "k2" not in rows and "k8" not in rows
    # fragment then compact with a delete still pending
    t.append(spark.createDataFrame([("k9", 9, 3)], ["k", "v", "ts"]))
    t.compact(target_rows_per_file=1_000_000)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert "k2" not in rows and "k8" not in rows and rows["k0"] == 100


def test_expire_snapshots_spares_inflight_generation(spark, tmp_path):
    """A CAS committer writes its data generation BEFORE its manifest, so an
    unreferenced generation for version current+1 may be an in-flight commit.
    Expiry must only reclaim generations at or below the newest expired
    version (ADVICE r4)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "itbl"), bucket_key="k", n_buckets=2)
    for gen in range(5):
        t.append(spark.createDataFrame([(f"k{gen}{i}", i) for i in range(4)], ["k", "v"]))
    cur = t.current_version()
    # simulate an in-flight commit: files on disk, manifest not yet written
    inflight = os.path.join(t.root, "data", f"{cur + 1:06d}-deadbeef")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not-yet-committed")
    # and an old CAS-loser orphan from an already-expired version
    orphan = os.path.join(t.root, "data", "000002-0badf00d")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as fh:
        fh.write(b"abandoned")
    res = t.expire_snapshots(retain_last=2)
    assert res["expired_versions"]  # something actually expired
    assert os.path.isdir(inflight)  # in-flight generation untouched
    assert not os.path.isdir(orphan)  # stale orphan reclaimed
    # non-generation dirs are ignored, not crashed on
    assert t.read().count() == 20


def test_compact_merges_fragmented_buckets(spark, tmp_path):
    """rewrite_data_files analog: a delete-heavy history fragments buckets
    into a file per commit; compact() merges them, preserves content
    byte-for-byte, and expire_snapshots reclaims the fragments."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "ctbl"), bucket_key="k", n_buckets=2)
    for gen in range(6):
        t.append(spark.createDataFrame(
            [(f"key{gen:02d}{i:02d}", gen * 100 + i) for i in range(20)], ["k", "v"]))
    before = t.snapshot()
    assert len(before["files"]) >= 10  # fragmented: ~2 files per append
    want = {(r["k"], r["v"]) for r in t.read().collect()}

    v = t.compact()
    snap = t.snapshot(v)
    assert snap["operation"] == "compact"
    assert len(snap["files"]) <= 2  # one file per bucket
    assert {(r["k"], r["v"]) for r in t.read().collect()} == want
    # time travel to pre-compact still works until expiry
    assert t.read(version=v - 1).count() == 120
    res = t.expire_snapshots(retain_last=1)
    assert res["removed_files"] >= 10
    assert {(r["k"], r["v"]) for r in t.read().collect()} == want
    # a second compact on an already-compact table is a no-op
    assert t.compact() == t.current_version()


def test_metadata_on_subtree_filesystem(spark, tmp_path):
    """VERDICT r03 #4 done-criterion: all VERSION/snapshot metadata IO
    routes through an explicit pyarrow FileSystem — here a
    SubTreeFileSystem — while Spark keeps writing the data files."""
    from pyarrow import fs as pafs

    root = tmp_path / "subtbl"
    root.mkdir()
    sub = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    t = SnapshotTable(spark, str(root), bucket_key="k", n_buckets=4,
                      metadata_fs=sub, metadata_root="")
    t.append(spark.createDataFrame(
        [("a", 1, _ts("2024-01-01")), ("b", 2, _ts("2024-01-01"))],
        ["k", "v", "updated_at"]))
    t.merge(spark.createDataFrame([("a", 9, _ts("2024-02-01"))], ["k", "v", "updated_at"]),
            key="k", order_col="updated_at")
    assert t.current_version() == 2
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {"a": 9, "b": 2}
    # metadata physically landed under the subtree root
    import os
    assert os.path.exists(root / "VERSION")
    assert os.path.exists(root / "snapshots" / "v000002.json")
    # a second handle over the same subtree sees the committed state
    t2 = SnapshotTable(spark, str(root), bucket_key="k", n_buckets=4,
                       metadata_fs=pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem()),
                       metadata_root="")
    assert t2.current_version() == 2 and t2.read().count() == 2


def test_concurrent_committers_linearize(spark, tmp_path):
    """VERDICT r03 #5 done-criterion: two interleaved committers (two
    table handles, merge vs merge race) never lose a snapshot — every
    upsert survives and versions are a contiguous linear history."""
    import threading

    root = str(tmp_path / "race")
    t1 = SnapshotTable(spark, root, bucket_key="k", n_buckets=4)
    t2 = SnapshotTable(spark, root, bucket_key="k", n_buckets=4)
    t1.overwrite(spark.createDataFrame([(f"k{i}", 0, _ts("2024-01-01")) for i in range(8)],
                                       ["k", "v", "updated_at"]))
    barrier = threading.Barrier(2)
    errs = []

    def committer(t, lo, hi, tag):
        try:
            barrier.wait()
            for i in range(lo, hi):
                t.merge(spark.createDataFrame([(f"k{i}", 100 + i, _ts("2024-02-01"))],
                                              ["k", "v", "updated_at"]),
                        key="k", order_col="updated_at", summary_extra={"writer": tag})
        except Exception as e:  # surfaced below — a thread must not die silently
            errs.append((tag, repr(e)))

    th1 = threading.Thread(target=committer, args=(t1, 0, 4, "w1"))
    th2 = threading.Thread(target=committer, args=(t2, 4, 8, "w2"))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert errs == []
    # linear history: contiguous versions, one per commit (1 overwrite + 8 merges)
    versions = [h["version"] for h in t1.history()]
    assert versions == list(range(1, 10))
    # no lost update: every merged value survived both writers
    got = {r["k"]: r["v"] for r in t1.read().collect()}
    assert got == {f"k{i}": 100 + i for i in range(8)}


def test_rollback_is_new_snapshot(spark, table):
    """Rollback commits a NEW snapshot referencing the old files, so a
    concurrent committer can never collide with a re-used version."""
    table.append(spark.createDataFrame([("a", 1)], ["k", "v"]))
    table.overwrite(spark.createDataFrame([("b", 2)], ["k", "v"]))
    v = table.rollback(1)
    assert v == 3 and table.current_version() == 3
    assert {r["k"] for r in table.read().collect()} == {"a"}
    ops = [h["operation"] for h in table.history()]
    assert ops == ["append", "overwrite", "rollback"]


def test_file_uri_root(spark, tmp_path):
    """A file:// URI root exercises the pyarrow FileSystem.from_uri path
    for metadata while Spark reads/writes the same URI natively — the
    local stand-in for an object-store deployment."""
    root = f"file://{tmp_path}/uritbl"
    t = SnapshotTable(spark, root, bucket_key="k", n_buckets=4)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]))
    t.delete_keys(spark.createDataFrame([("a",)], ["k"]), key="k")
    assert t.current_version() == 2
    assert {r["k"] for r in t.read().collect()} == {"b"}
    # metadata landed under the physical path
    import os
    assert os.path.exists(tmp_path / "uritbl" / "VERSION")
    assert os.path.exists(tmp_path / "uritbl" / "snapshots" / "v000002.json")


def test_merge_schema_evolution(spark, tmp_path):
    """Additive schema evolution: a merge batch with a NEW column upserts
    cleanly; old rows read the new column as NULL (mergeSchema read);
    a batch MISSING a column leaves existing values subject to
    latest-wins on the key. Bucketed path included."""
    t = SnapshotTable(spark, str(tmp_path / "evtbl"), bucket_key="k", n_buckets=4)
    t.overwrite(spark.createDataFrame(
        [("a", 1, _ts("2024-01-01")), ("b", 2, _ts("2024-01-01"))],
        ["k", "v", "updated_at"]))
    # batch ADDS column 'extra'
    t.merge(spark.createDataFrame(
        [("a", 10, _ts("2024-02-01"), "x"), ("c", 30, _ts("2024-02-01"), "y")],
        ["k", "v", "updated_at", "extra"]),
        key="k", order_col="updated_at")
    got = {r["k"]: (r["v"], r["extra"]) for r in t.read().collect()}
    assert got == {"a": (10, "x"), "b": (2, None), "c": (30, "y")}
    # batch MISSING 'extra' still merges (extra becomes NULL for its keys)
    t.merge(spark.createDataFrame(
        [("c", 31, _ts("2024-03-01"))], ["k", "v", "updated_at"]),
        key="k", order_col="updated_at")
    got = {r["k"]: (r["v"], r["extra"]) for r in t.read().collect()}
    assert got["c"] == (31, None) and got["a"] == (10, "x")


# ------------------------------------------------- r6: positional deletes
def test_positional_delete_by_predicate(spark, tmp_path):
    """read(with_positions=True) -> filter -> delete_positions is a
    DELETE WHERE with zero data-file rewrites."""
    t = SnapshotTable(spark, str(tmp_path / "ptbl"), bucket_key="k", n_buckets=4)
    t.overwrite(spark.createDataFrame(
        [(f"k{i}", i) for i in range(30)], ["k", "v"]))
    files_v1 = {f["path"] for f in t.snapshot()["files"]}
    pos = (t.read(with_positions=True)
           .filter(F.col("v") % 7 == 3).select("_file", "_pos"))
    t.delete_positions(pos)
    snap = t.snapshot()
    assert snap["operation"] == "delete-pos"
    assert {f["path"] for f in snap["files"]} == files_v1  # no rewrite
    assert all(d["kind"] == "pos" for d in snap["deletes"])
    got = {r["v"] for r in t.read().collect()}
    assert got == {i for i in range(30) if i % 7 != 3}
    # the hidden address columns never leak into a plain read
    assert "_pos" not in t.read().columns and "_file" not in t.read().columns
    # time travel to before the delete still sees everything
    assert t.read(version=1).count() == 30


def test_positional_deletes_fold_and_compose(spark, tmp_path):
    """apply_deletes folds positional + equality deletes together; a
    later merge neither resurrects nor loses rows."""
    t = SnapshotTable(spark, str(tmp_path / "pftbl"), bucket_key="k", n_buckets=2)
    t.overwrite(spark.createDataFrame(
        [(f"k{i}", i) for i in range(20)], ["k", "v"]))
    pos = (t.read(with_positions=True)
           .filter(F.col("v") < 3).select("_file", "_pos"))
    t.delete_positions(pos)
    t.delete_keys(spark.createDataFrame([("k9",)], ["k"]), key="k", mode="mor")
    want = {f"k{i}" for i in range(3, 20)} - {"k9"}
    assert {r["k"] for r in t.read().collect()} == want
    v = t.apply_deletes()
    snap = t.snapshot(v)
    assert snap["deletes"] == []
    assert {r["k"] for r in t.read().collect()} == want
    # merge after the fold: upsert one key, everything else intact
    t.merge(spark.createDataFrame([("k5", 500)], ["k", "v"]),
            key="k", order_col="v")
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows["k5"] == 500 and set(rows) == want


def test_delete_compact_threshold_autofolds(spark, tmp_path):
    """VERDICT r5 #7: once the pending delete-file count reaches the
    threshold, the next MoR delete auto-runs apply_deletes so delete
    files cannot accumulate unboundedly."""
    t = SnapshotTable(spark, str(tmp_path / "ttbl"), bucket_key="k",
                      n_buckets=2, delete_compact_threshold=2)
    t.overwrite(spark.createDataFrame(
        [(f"k{i}", i) for i in range(12)], ["k", "v"]))
    t.delete_keys(spark.createDataFrame([("k1",)], ["k"]), key="k", mode="mor")
    assert len(t.snapshot()["deletes"]) == 1  # below threshold: pending
    v = t.delete_keys(spark.createDataFrame([("k2",)], ["k"]), key="k",
                      mode="mor")
    snap = t.snapshot(v)
    assert snap["operation"] == "apply_deletes" and snap["deletes"] == []
    assert {r["k"] for r in t.read().collect()} == \
        {f"k{i}" for i in range(12)} - {"k1", "k2"}


def test_delete_positions_stale_after_rewrite_raises(spark, tmp_path):
    """ADVICE r6 (medium): positions derived before a rewrite commit must
    be rejected at commit time — silently matching nothing would let the
    rows survive a DELETE."""
    from extractors_geo_spark.sources.snapshot_table import StalePositions

    t = SnapshotTable(spark, str(tmp_path / "stale"), bucket_key="k",
                      n_buckets=2)
    t.overwrite(spark.createDataFrame(
        [(f"k{i}", i) for i in range(10)], ["k", "v"]))
    pos = (t.read(with_positions=True)
           .filter(F.col("v") < 4).select("_file", "_pos")
           .collect())  # pin the addresses as of v1
    # a rewrite lands in between: CoW delete rewrites the touched bucket
    t.delete_keys(spark.createDataFrame([("k9",)], ["k"]), key="k")
    stale = spark.createDataFrame(pos, ["_file", "_pos"])
    with pytest.raises(StalePositions):
        t.delete_positions(stale)
    # nothing was committed; re-deriving from the current snapshot works
    assert t.snapshot()["operation"] == "delete"
    fresh = (t.read(with_positions=True)
             .filter(F.col("v") < 4).select("_file", "_pos"))
    t.delete_positions(fresh)
    assert {r["v"] for r in t.read().collect()} == set(range(4, 9))


def test_pos_delete_ref_files_stamped(spark, tmp_path):
    """r7: positional delete manifest entries carry the referenced
    data-file set so readers and apply_deletes prune without re-reading
    the delete parquet."""
    t = SnapshotTable(spark, str(tmp_path / "refs"), bucket_key="k",
                      n_buckets=2)
    t.overwrite(spark.createDataFrame(
        [(f"k{i}", i) for i in range(10)], ["k", "v"]))
    pos = (t.read(with_positions=True)
           .filter(F.col("v") == 3).select("_file", "_pos"))
    t.delete_positions(pos)
    dels = t.snapshot()["deletes"]
    assert dels and all(d.get("ref_files") for d in dels)
    valid = {f["path"] for f in t.snapshot()["files"]}
    refs = {p for d in dels for p in d["ref_files"]}
    assert refs and refs <= valid
    # _pos_delete_paths answers from the manifest stamp (no parquet read)
    assert t._pos_delete_paths(dels) == refs


def test_eq_delete_file_pruning_rules():
    """Driver-side manifest check: seq, bucket, and key-range each prune;
    anything unprovable stays dirty (over-approximation only)."""
    t = SnapshotTable.__new__(SnapshotTable)  # helpers are self-free
    f = {"path": "p", "bucket": 3, "seq": 1, "min_key": "k10", "max_key": "k19"}
    hit = {"seq": 2, "bucket": 3, "min_key": "k15", "max_key": "k15"}
    assert t._eq_del_hits(f, hit)
    assert not t._eq_del_hits(f, {**hit, "seq": 1})        # not newer
    assert not t._eq_del_hits(f, {**hit, "bucket": 4})     # other bucket
    assert not t._eq_del_hits(f, {**hit, "min_key": "k40",
                                  "max_key": "k99"})       # disjoint range
    # unprovable cases stay dirty
    assert t._eq_del_hits(f, {**hit, "min_key": None, "max_key": None})
    assert t._eq_del_hits({**f, "bucket": None, "min_key": None,
                           "max_key": None}, hit)
    assert t._eq_del_hits(f, {**hit, "min_key": 5, "max_key": 9})  # mixed types
    # positional: ref_files stamp decides; missing stamp -> dirty
    assert t._pos_del_hits(f, {"ref_files": ["p", "q"]})
    assert not t._pos_del_hits(f, {"ref_files": ["q"]})
    assert t._pos_del_hits(f, {"ref_files": None})
    assert t._pos_del_hits(f, {})


def test_read_skips_irrelevant_delete_files(spark, tmp_path):
    """r7 (VERDICT r06 #3): a delete confined to keys disjoint from every
    data file leaves the read plan join-free; deletes confined to one
    bucket anti-join only that bucket's files."""
    t = SnapshotTable(spark, str(tmp_path / "prune"), bucket_key="k",
                      n_buckets=4, delete_compact_threshold=0)
    t.overwrite(spark.createDataFrame(
        [(f"k{i:02d}", i) for i in range(40)], ["k", "v"]))
    # keys that don't exist: every data file min/max-prunes the delete
    t.delete_keys(spark.createDataFrame([("zz99",)], ["k"]), key="k",
                  mode="mor")
    df = t.read()
    assert "LeftAnti" not in df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 40
    # a real delete: correct rows AND exactly one anti-join in the plan
    t.delete_keys(spark.createDataFrame([("k05",)], ["k"]), key="k",
                  mode="mor")
    df2 = t.read()
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftAnti") == 1
    assert {r["v"] for r in df2.collect()} == set(range(40)) - {5}
