"""Scenario test mirroring the reference's iosimulator workloads
(TEST/com/taobao/adfs/iosimulator: FileCreator/FileOpen/FileListing/
FileRename/FileReplication/FileCompleted/FileInfoGet/BlockAllocator/
BlockReceiver/BlockSynchronization/DatanodeReg) — one end-to-end
NameNode-style session against the namespace + blockmap tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.blockmap import BlockMap
from adfs_spark.namespace import Namespace
from adfs_spark.schema import BLOCK, DATANODE, LEASE
from adfs_spark.storage import VersionedTable


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("scenario")
    ns = Namespace.create_at(spark, str(d / "fs"))
    blocks = VersionedTable(spark, BLOCK, str(d / "blocks"))
    blocks.init()
    dns = VersionedTable(spark, DATANODE, str(d / "dns"))
    dns.init()
    leases = VersionedTable(spark, LEASE, str(d / "leases"))
    leases.init()
    return BlockMap(ns, blocks, dns, leases)


def test_full_namenode_session(world, spark):
    bm = world
    ns = bm.namespace

    # DatanodeReg: three datanodes register
    regs = spark.createDataFrame(
        [
            (i, f"dn{i}:50010", f"st{i}", 50020, 50075, 10**9, 0, 10**9, 1000 * i, 0, "/r1", "NORMAL")
            for i in (1, 2, 3)
        ],
        DATANODE.struct_type(include_version=False),
    )
    bm.heartbeat(regs)
    assert bm.cluster_statistics().first()["n_datanodes"] == 3

    # FileCreator: mkdirs + create with lease
    ns.mkdirs("/user/app/logs")
    fid = ns.create("/user/app/logs/part-0", replication=2, lease_holder="client-1")
    assert ns.get_file_info("/user/app/logs/part-0")["leaseHolder"] == "client-1"

    # BlockAllocator: two blocks, 2 replicas each
    bm.allocate_block(fid, 500, 0, [1, 2])
    bm.allocate_block(fid, 501, 1, [2, 3])

    # BlockReceiver: replicas report completed lengths (masked update)
    bm.blocks.update_where(F.col("id").isin([500, 501]), {"length": F.lit(64).cast("long")})

    # FileCompleted: file length = sum of block lengths, lease dropped
    total = bm.file_length_from_blocks(fid)
    assert total == 128
    ns.complete_file("/user/app/logs/part-0", total)
    info = ns.get_file_info("/user/app/logs/part-0")
    assert info["length"] == 128 and info["leaseHolder"] is None

    # FileOpen/getBlockLocations: ordered blocks with datanode names
    locs = bm.get_block_locations("/user/app/logs/part-0").collect()
    assert [r["block_id"] for r in locs] == [500, 501]

    # FileListing
    names = [r["name"] for r in ns.get_listing("/user/app/logs").collect()]
    assert names == ["part-0"]

    # FileRename: move the logs dir; block mapping survives (ids stable)
    ns.mkdirs("/archive")
    ns.rename("/user/app/logs", "/archive", new_name="logs-2024")
    assert ns.exists("/archive/logs-2024/part-0")
    locs2 = bm.get_block_locations("/archive/logs-2024/part-0").collect()
    assert [r["block_id"] for r in locs2] == [500, 501]

    # FileReplication: bump replication, under-replication queue reacts
    ns.set_replication("/archive/logs-2024/part-0", 3)
    under = {r["id"]: r["priority"] for r in bm.under_replicated_blocks().collect()}
    assert set(under) == {500, 501}

    # BlockSynchronization: dn1's report diff
    reported = spark.createDataFrame(
        [(500, 64, 1), (999, 64, 1)], "id: long, length: long, generationStamp: long"
    )
    to_add, to_remove, mismatched = bm.process_report(1, reported)
    assert [r["id"] for r in to_add.collect()] == [999]
    assert to_remove.count() == 0

    # delete: subtree tombstoned, blocks of dead file found by anti-join
    ns.delete("/archive/logs-2024", recursive=True)
    live_files = ns.ns().select("id")
    bl = bm.blocks.live()
    orphans = bl.join(live_files, bl["fileId"] == live_files["id"], "left_anti")
    assert orphans.select("id").distinct().count() == 2  # blocks 500, 501 orphaned


def test_append_and_lease_recovery_session(world, spark):
    """create → complete → append → writer dies → recoverLease
    (FSNamesystem.appendFile / internalReleaseLease; BASELINE.md rows
    append1-3 and recoverLease)."""
    bm = world
    ns = bm.namespace

    ns.mkdirs("/wal")
    fid = ns.create("/wal/seg-1", replication=2, lease_holder="writer-A")
    bm.allocate_block(fid, 600, 0, [1, 2])
    bm.blocks.update_where(F.col("id") == 600, {"length": F.lit(100).cast("long")})
    ns.complete_file("/wal/seg-1", bm.file_length_from_blocks(fid))
    assert ns.get_file_info("/wal/seg-1")["leaseHolder"] is None

    # append: reopen under a new lease, add one more block
    assert ns.append_file("/wal/seg-1", "writer-B") == fid
    bm.allocate_block(fid, 601, 1, [2, 3])
    info = ns.get_file_info("/wal/seg-1")
    assert info["leaseHolder"] == "writer-B"

    # writer-B dies mid-append: the new block reports a partial length,
    # recovery finalizes length from the A3 sum and clears the holder
    bm.blocks.update_where(F.col("id") == 601, {"length": F.lit(40).cast("long")})
    final = bm.file_length_from_blocks(fid)
    assert final == 140
    ns.recover_lease("/wal/seg-1", final_length=final, now_ms=123_456)
    info = ns.get_file_info("/wal/seg-1")
    assert info["leaseHolder"] is None
    assert info["length"] == 140 and info["leaseRecoveryTime"] == 123_456

    # the file reads normally again, both blocks in order
    locs = bm.get_block_locations("/wal/seg-1").collect()
    assert [r["block_id"] for r in locs] == [600, 601]
