"""pyarrow.fs metadata helpers: atomic replace, exclusive create under
real thread contention, subtree unwrapping."""

import threading

from pyarrow import fs as pafs

from extractors_geo_spark import fs as xfs


def test_resolve_forms(tmp_path):
    f, p = xfs.resolve(str(tmp_path))
    assert isinstance(f, pafs.LocalFileSystem) and p == str(tmp_path)
    f, p = xfs.resolve(f"file://{tmp_path}")
    assert isinstance(f, pafs.LocalFileSystem) and p == str(tmp_path)
    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    f, p = xfs.resolve("x/y", sub)
    assert f is sub and p == "x/y"


def test_read_write_replace(tmp_path):
    f, root = xfs.resolve(str(tmp_path))
    p = xfs.join(root, "a.txt")
    assert xfs.read_text(f, p) is None
    xfs.write_text(f, p, "one")
    assert xfs.read_text(f, p) == "one"
    xfs.replace_text(f, p, "two")
    assert xfs.read_text(f, p) == "two"
    # no tmp litter left behind
    names = [i.base_name for i in xfs.listdir(f, root)]
    assert names == ["a.txt"]


def test_create_exclusive_thread_race(tmp_path):
    """64 threads race to create the same marker: exactly ONE wins, and
    the winner's payload is what lands — the CAS primitive SnapshotTable
    commits are built on."""
    f, root = xfs.resolve(str(tmp_path))
    target = xfs.join(root, "v000001.json")
    wins = []
    barrier = threading.Barrier(64)

    def attempt(i):
        barrier.wait()
        if xfs.create_exclusive(f, target, f"writer-{i}"):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert xfs.read_text(f, target) == f"writer-{wins[0]}"


def test_create_exclusive_subtree_unwrap(tmp_path):
    sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    assert xfs.create_exclusive(sub, "m.json", "a") is True
    assert xfs.create_exclusive(sub, "m.json", "b") is False
    assert (tmp_path / "m.json").read_text() == "a"
