from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.namespace import Namespace, NamespaceError


@pytest.fixture()
def ns(spark, tmp_path):
    return Namespace.create_at(spark, str(tmp_path / "fs"))


def test_mkdirs_and_resolve(ns):
    deep = ns.mkdirs("/a/b/c")
    info = ns.get_file_info("/a/b/c")
    assert info is not None and info["id"] == deep and info["length"] == -1
    # idempotent
    assert ns.mkdirs("/a/b/c") == deep


def test_resolve_many_batch(ns, spark):
    ns.mkdirs("/x/y")
    ns.create("/x/y/f")
    paths = spark.createDataFrame(
        [("/x",), ("/x/y",), ("/x/y/f",), ("/missing",)], "path: string"
    )
    got = {r["path"]: r for r in ns.resolve_many(paths).collect()}
    assert set(got) == {"/x", "/x/y", "/x/y/f"}  # missing path: no row
    assert got["/x/y/f"]["length"] == 0 and got["/x/y"]["length"] == -1


def test_create_file_and_guards(ns):
    ns.mkdirs("/data")
    fid = ns.create("/data/f1", replication=2)
    info = ns.get_file_info("/data/f1")
    assert info["id"] == fid and info["replication"] == 2
    # parent must exist
    with pytest.raises(NamespaceError):
        ns.create("/nope/f2")
    # no duplicate without overwrite
    with pytest.raises(NamespaceError):
        ns.create("/data/f1")
    # overwrite replaces
    fid2 = ns.create("/data/f1", overwrite=True)
    assert fid2 != fid
    # type-change forbidden
    with pytest.raises(NamespaceError):
        ns.mkdirs("/data/f1")


def test_listing_pagination(ns):
    ns.mkdirs("/d")
    for i in range(5):
        ns.create(f"/d/f{i}")
    page = ns.get_listing("/d", limit=3).collect()
    assert [r["name"] for r in page] == ["f0", "f1", "f2"]
    page2 = ns.get_listing("/d", start_after="f2", limit=3).collect()
    assert [r["name"] for r in page2] == ["f3", "f4"]


def test_rename_moves_subtree(ns):
    ns.mkdirs("/src/sub")
    ns.create("/src/sub/f")
    ns.mkdirs("/dst")
    ns.rename("/src/sub", "/dst", new_name="moved")
    assert ns.exists("/dst/moved/f")
    assert not ns.exists("/src/sub")


def test_rename_into_own_subtree_fails(ns):
    ns.mkdirs("/cyc/inner")
    with pytest.raises(NamespaceError):
        ns.rename("/cyc", "/cyc/inner")
    with pytest.raises(NamespaceError):
        ns.rename("/cyc", "/cyc")


def test_delete_guard_and_recursive(ns):
    ns.mkdirs("/del/inner")
    ns.create("/del/inner/f")
    with pytest.raises(NamespaceError):
        ns.delete("/del")
    n = ns.delete("/del", recursive=True)
    assert n == 3
    assert not ns.exists("/del")
    # tombstones retained in snapshot
    snap = ns.table.snapshot()
    assert snap.filter(F.col("version") < 0).count() == 3


def test_content_summary_and_complete(ns):
    ns.mkdirs("/cs")
    ns.create("/cs/f1")
    ns.create("/cs/f2")
    ns.complete_file("/cs/f1", 123)
    ns.complete_file("/cs/f2", 77)
    row = ns.content_summary("/cs")
    assert row["total_length"] == 200 and row["file_count"] == 2 and row["dir_count"] == 1


def test_set_replication_and_times(ns):
    ns.mkdirs("/m")
    ns.create("/m/f")
    ns.set_replication("/m/f", 5)
    ns.set_times("/m/f", mtime=111, atime=222)
    info = ns.get_file_info("/m/f")
    assert info["replication"] == 5 and info["mtime"] == 111 and info["atime"] == 222
    with pytest.raises(NamespaceError):
        ns.set_replication("/m", 2)  # dirs have no replication


def test_paths(ns):
    ns.mkdirs("/p/q")
    ns.create("/p/q/f")
    paths = {r["path"] for r in ns.paths().collect()}
    assert "/p/q/f" in paths


def test_set_owner_and_permission(ns):
    ns.mkdirs("/own")
    ns.create("/own/f.txt")
    # defaults: 755 dirs, 644 files
    assert ns.get_file_info("/own")["permission"] == 0o755
    assert ns.get_file_info("/own/f.txt")["permission"] == 0o644
    ns.set_owner("/own/f.txt", 42)
    ns.set_permission("/own/f.txt", 0o600)
    row = ns.get_file_info("/own/f.txt")
    assert row["owner"] == 42 and row["permission"] == 0o600
    import pytest as _pytest

    from adfs_spark.namespace import NamespaceError

    with _pytest.raises(NamespaceError):
        ns.set_permission("/own/f.txt", 0o10000)
    with _pytest.raises(NamespaceError):
        ns.set_owner("/nope", 1)
