"""Cross-table atomic commits: FileSystemStore verbs over one
TransactionLog — all-or-nothing like the reference's single-lock op
batch (DistributedOperationQueue.getOperations :82-103,
FSNamesystem.startFileInternal :842-870)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.filesystem import FileSystemStore
from adfs_spark.schema import DATANODE
from adfs_spark.storage import VersionedTable


@pytest.fixture()
def fs(spark, tmp_path):
    store = FileSystemStore.create_at(spark, str(tmp_path / "world"))
    regs = spark.createDataFrame(
        [
            (i, f"dn{i}:50010", f"st{i}", 50020, 50075, 10**9, 0, 10**9, 1000, 0, "/r1", "NORMAL")
            for i in (1, 2, 3)
        ],
        DATANODE.struct_type(include_version=False),
    )
    store.blockmap.heartbeat(regs)
    store.namespace.mkdirs("/data")
    return store


def test_create_allocate_complete_delete_lifecycle(fs):
    ns, bm = fs.namespace, fs.blockmap
    fid = fs.create_file("/data/f1", replication=2, lease_holder="client-9")
    # file AND lease landed in one commit
    assert ns.get_file_info("/data/f1")["leaseHolder"] == "client-9"
    assert {r["holder"] for r in bm.leases.live().collect()} == {"client-9"}
    fs.allocate_block(fid, 900, 0, [1, 2])
    fs.allocate_block(fid, 901, 1, [2, 3])
    bm.blocks.update_where(
        F.col("id").isin([900, 901]), {"length": F.lit(32).cast("long")}
    )
    total = fs.complete_file("/data/f1")
    assert total == 64
    info = ns.get_file_info("/data/f1")
    assert info["length"] == 64 and info["leaseHolder"] is None
    assert bm.leases.live().count() == 0  # lease dropped atomically
    n = fs.delete("/data/f1")
    assert n == 1
    assert not ns.exists("/data/f1")
    assert bm.blocks.live().count() == 0  # no dangling blocks


def test_crash_between_lease_and_file_leaves_neither(fs, monkeypatch):
    """create_file writes FILE then LEASE; a crash on the LEASE write
    must leave NO visible file row either — the manifest was never
    committed, so the FILE append stays fenced."""
    ns, bm = fs.namespace, fs.blockmap
    orig = VersionedTable._driver_append_rows

    def boom(self, rows, op, base, negate=False):
        if self.spec.name == "lease":
            raise RuntimeError("crash before LEASE write")
        return orig(self, rows, op, base, negate)

    monkeypatch.setattr(VersionedTable, "_driver_append_rows", boom)
    with pytest.raises(RuntimeError):
        fs.create_file("/data/broken", lease_holder="client-x")
    monkeypatch.undo()
    # reader sees NEITHER the file nor the lease
    assert not ns.exists("/data/broken")
    assert bm.leases.live().count() == 0
    # the fenced tail is recorded in the manifest and the verb is
    # cleanly retryable — new versions stamp past the fence
    meta = fs.txn.latest()["tables"]["file"]
    assert meta["aborted"], "file table's orphaned append must be fenced"
    fid = fs.create_file("/data/broken", lease_holder="client-x")
    assert ns.get_file_info("/data/broken")["id"] == fid
    assert bm.leases.live().count() == 1


def test_crash_between_block_and_file_delete_leaves_both(fs, monkeypatch):
    """delete tombstones BLOCK rows then FILE rows; a crash on the FILE
    write must leave the block rows still visible (nothing committed):
    no half-deleted state, no dangling cleanup for D7 to find."""
    ns, bm = fs.namespace, fs.blockmap
    fid = fs.create_file("/data/f2", lease_holder=None)
    fs.allocate_block(fid, 950, 0, [1, 2])
    assert bm.blocks.live().count() == 2
    orig = VersionedTable._driver_append_rows

    def boom(self, rows, op, base, negate=False):
        if self.spec.name == "file" and op == "DELETE":
            raise RuntimeError("crash before FILE tombstones")
        return orig(self, rows, op, base, negate)

    monkeypatch.setattr(VersionedTable, "_driver_append_rows", boom)
    with pytest.raises(RuntimeError):
        fs.delete("/data/f2")
    monkeypatch.undo()
    # reader sees NEITHER table's tombstones: file still exists AND its
    # blocks are all still visible
    assert ns.exists("/data/f2")
    assert bm.blocks.live().count() == 2
    # retry completes the verb
    assert fs.delete("/data/f2") == 1
    assert not ns.exists("/data/f2")
    assert bm.blocks.live().count() == 0


def test_txn_stale_lock_steal_fences_all_tables(fs, spark, monkeypatch):
    """Hard-kill recovery at the txn level: a dead writer's expired
    lock is stolen; every enrolled table's unpublished tail is fenced
    in a fence-only manifest commit before the stealer proceeds.  The
    lease is aged by shrinking the TTL (medium-agnostic — a utime on
    the lock would only work on the POSIX backend)."""
    from adfs_spark import storage as storage_mod
    from adfs_spark.storage import OP_COL

    ns = fs.namespace
    ft = ns.table
    v0 = ft.max_version()
    # dead writer: appended to the FILE changelog, still holds the lock
    orphan = spark.createDataFrame(
        [(999_999, 0, "ghost", 0, 0, 0, 0, 0, 0, 420, None, 0, -1, -1, v0 + 1)],
        ft.spec.struct_type(),
    )
    ft._append_changelog(orphan.withColumn(OP_COL, F.lit("UPSERT")))
    lock = fs.txn._reserve(fs.txn.last_commit_id() + 1)
    assert lock is not None
    monkeypatch.setattr(storage_mod, "LOCK_TTL_SEC", 0.0)
    # next verb steals, fences, and proceeds cleanly
    fs.create_file("/data/after-steal")
    assert ns.exists("/data/after-steal")
    assert not ns.ns().filter(F.col("name") == "ghost").take(1)
    meta = fs.txn.latest()["tables"]["file"]
    assert [v0 + 1, v0 + 1] in meta["aborted"]


def test_lease_survives_while_holder_has_other_open_file(fs):
    """ADVICE r4: complete_file must drop the per-holder LEASE row only
    when the holder has NO remaining under-construction file — the
    reference removes a lease iff it holds no paths
    (LeaseManager.removeLease :122-133)."""
    ns, bm = fs.namespace, fs.blockmap
    fs.create_file("/data/a", lease_holder="cli-1")
    fs.create_file("/data/b", lease_holder="cli-1")
    assert bm.leases.live().count() == 1
    fs.complete_file("/data/a", now_ms=777)
    # cli-1 still has /data/b open: the lease survives, time refreshed
    rows = bm.leases.live().collect()
    assert [r["holder"] for r in rows] == ["cli-1"]
    assert rows[0]["time"] == 777
    fs.complete_file("/data/b")
    assert bm.leases.live().count() == 0  # last open file -> lease dropped


def test_delete_keeps_lease_for_files_outside_subtree(fs):
    """Deleting a subtree must not strip lease protection from a
    holder's still-open file elsewhere in the namespace."""
    ns, bm = fs.namespace, fs.blockmap
    fs.namespace.mkdirs("/data/sub")
    fs.create_file("/data/sub/f1", lease_holder="cli-2")
    fs.create_file("/data/keep", lease_holder="cli-2")
    fs.create_file("/data/sub/f2", lease_holder="cli-3")
    assert {r["holder"] for r in bm.leases.live().collect()} == {"cli-2", "cli-3"}
    fs.delete("/data/sub", recursive=True)
    # cli-3's only file died with the subtree -> lease dropped;
    # cli-2 still holds /data/keep -> lease survives
    assert {r["holder"] for r in bm.leases.live().collect()} == {"cli-2"}
    assert ns.exists("/data/keep")
