"""Changelog-append write mode: overlay reads, fold-down, crash fencing.

The append path is the engine's analog of the reference's B-tree point
update (FileRepository.updateInternal :226-286): small mutation batches
append to the changelog and publish via a visibility watermark instead
of rewriting buckets; reads LWW-merge the pending tail; a merge write or
compact() folds it down.  Crashed half-writes are fenced into aborted
version ranges and stay invisible forever (the reference discards
unfinished op batches on journal replay,
DistributedOperationQueue.java:82-103).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.schema import ColumnSpec, TableSpec
from adfs_spark.storage import OP_COL, VersionedTable

SPEC = TableSpec(
    name="ovl",
    columns=(ColumnSpec("k", "long"), ColumnSpec("v", "string")),
    primary_key=("k",),
    versioned=True,
)


def _mk(spark, tmp_path, n=20, num_buckets=0, name="t"):
    t = VersionedTable(spark, SPEC, str(tmp_path / name), num_buckets=num_buckets)
    t.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(n)], "k: long, v: string")
    )
    return t


def _live(t):
    return {r["k"]: r["v"] for r in t.live().collect()}


@pytest.mark.parametrize("num_buckets", [0, 8])
def test_append_mode_reads_equal_merge_mode(spark, tmp_path, num_buckets):
    """The same op sequence through append and merge modes must yield
    identical live views — the overlay read path is semantically
    invisible."""
    a = _mk(spark, tmp_path, num_buckets=num_buckets, name="a")
    m = _mk(spark, tmp_path, num_buckets=num_buckets, name="m")
    for t, mode in ((a, "append"), (m, "merge")):
        t.upsert(
            spark.createDataFrame([(2, "X"), (30, "new")], "k: long, v: string"),
            mode=mode,
        )
        t.update_where(F.col("k") % 5 == 0, {"v": F.lit("five")}, mode=mode)
        t.delete_where(F.col("k") == 7, mode=mode)
    assert _live(a) == _live(m)
    assert a.max_version() == m.max_version()
    # append table: current/ untouched since init, everything pending
    meta = a._overlay_meta()
    assert meta["visible_through"] > meta["compacted_through"]
    # merge table: fully folded
    meta_m = m._overlay_meta()
    assert meta_m["visible_through"] == meta_m["compacted_through"]


def test_append_then_merge_write_folds_overlay(spark, tmp_path):
    t = _mk(spark, tmp_path, num_buckets=4)
    t.update_where(F.col("k") == 3, {"v": F.lit("three")}, mode="append")
    t.delete_where(F.col("k") == 4, mode="append")
    assert t._pending_overlay() is not None
    # a merge-mode write folds its own delta AND the pending tail
    t.upsert(spark.createDataFrame([(50, "fifty")], "k: long, v: string"), mode="merge")
    assert t._pending_overlay() is None
    live = _live(t)
    assert live[3] == "three" and 4 not in live and live[50] == "fifty"
    # folded rows are physically in current/ (raw read, no overlay)
    raw = {r["k"]: r["v"] for r in t._read_current_raw().filter("version >= 0").collect()}
    assert raw == live


def test_compact_folds_overlay_and_plan_is_bare_scan(spark, tmp_path):
    t = _mk(spark, tmp_path, num_buckets=4)
    t.update_where(F.col("k") == 1, {"v": F.lit("one")}, mode="append")
    before = _live(t)
    t.compact()
    assert t._pending_overlay() is None
    assert _live(t) == before
    # with nothing pending, snapshot() is the bare current/ scan
    plan = t.snapshot()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_point_lookup_sees_overlay(spark, tmp_path):
    t = _mk(spark, tmp_path, num_buckets=8)
    t.upsert(spark.createDataFrame([(100, "hundred")], "k: long, v: string"), mode="append")
    t.update_where(F.col("k") == 2, {"v": F.lit("TWO")}, mode="append")
    t.delete_where(F.col("k") == 3, mode="append")
    got = {r["k"]: r["v"] for r in t.point_lookup([2, 3, 100, 5]).collect()}
    assert got == {2: "TWO", 100: "hundred", 5: "v5"}


def test_auto_mode_routes_by_threshold(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, num_buckets=4)
    t.append_threshold = 10
    # 5 rows <= 10 -> append (ct unchanged)
    t.delete_where_keys(
        spark.createDataFrame([(i,) for i in range(5)], "k: long"), mode="auto"
    )
    m = t._overlay_meta()
    assert m["visible_through"] > m["compacted_through"]
    # 50 rows > 10 -> merge (folds everything)
    t.delete_where_keys(
        spark.createDataFrame([(i,) for i in range(50, 100)], "k: long"), mode="auto"
    )
    m = t._overlay_meta()
    assert m["visible_through"] == m["compacted_through"]
    assert t.count() == 45


def test_crashed_append_is_fenced_and_invisible(spark, tmp_path, monkeypatch):
    """A writer that appends changelog rows but fails before publishing
    leaves orphans above the watermark: the failure handler fences the
    range (while still holding the commit reservation), reads never see
    the rows, and the next writer stamps past them — no collision."""
    t = _mk(spark, tmp_path, n=10)
    before = _live(t)
    v0 = t.max_version()
    # crash injection: the visibility bump raises AFTER the changelog
    # rows landed (the exact window a real crash hits)
    real_mark = VersionedTable._mark_visible

    def boom(self, vt_new):
        raise RuntimeError("crash between append and publish")

    monkeypatch.setattr(VersionedTable, "_mark_visible", boom)
    with pytest.raises(RuntimeError):
        t.upsert(
            spark.createDataFrame([(5, "ORPHAN"), (99, "GHOST")], "k: long, v: string"),
            mode="append",
        )
    monkeypatch.setattr(VersionedTable, "_mark_visible", real_mark)
    assert _live(t) == before  # orphans invisible
    meta = t._overlay_meta()
    assert meta["aborted"] == [[v0 + 1, v0 + 2]]  # fenced by the handler
    # next write stamps PAST the fenced range — no version collision
    t.upsert(spark.createDataFrame([(5, "good")], "k: long, v: string"), mode="append")
    live = _live(t)
    assert live[5] == "good" and 99 not in live
    assert t.max_version() == v0 + 3
    # delta/time travel exclude the fenced range too
    d = {r["k"] for r in t.delta(v0 + 1, v0 + 3).collect()}
    assert d == {5}
    tt = {r["k"]: r["v"] for r in t.live_as_of(v0 + 2).collect()}
    assert tt == before  # as-of inside the fenced range = pre-crash state
    # and a fold keeps them out of current/ forever
    t.compact()
    assert 99 not in _live(t)
    raw = {r["k"]: r["v"] for r in t._read_current_raw().filter("version >= 0").collect()}
    assert raw[5] == "good" and 99 not in raw


def test_stale_lock_steal_fences_orphans(spark, tmp_path, monkeypatch):
    """Hard-kill recovery: a dead writer's expired .lock is stolen and
    its unpublished changelog tail fenced before the stealer writes.
    The lease is aged by shrinking the TTL (medium-agnostic: a direct
    utime on the lock file would only work on the POSIX backend)."""
    from adfs_spark import storage as storage_mod

    t = _mk(spark, tmp_path, n=10)
    v0 = t.max_version()
    # simulate the hard-killed writer: changelog rows + a held lock,
    # no publish, no unlink (process died)
    orphan = spark.createDataFrame(
        [(5, "ORPHAN", v0 + 1)], "k: long, v: string, version: long"
    )
    t._append_changelog(orphan.withColumn(OP_COL, F.lit("UPSERT")))
    lock = t._reserve_commit(t.last_commit_id() + 1)
    assert lock is not None
    # age the lock past the TTL so the next writer steals it
    monkeypatch.setattr(storage_mod, "LOCK_TTL_SEC", 0.0)
    t.upsert(spark.createDataFrame([(5, "good")], "k: long, v: string"), mode="append")
    meta = t._overlay_meta()
    assert [v0 + 1, v0 + 1] in meta["aborted"]
    live = _live(t)
    assert live[5] == "good"
    assert t.max_version() == v0 + 2  # stamped past the fence


def test_append_ops_publishes_prestamped_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, n=5)
    v0 = t.max_version()
    ops = spark.createDataFrame(
        [(1, "one", v0 + 1), (2, "gone", -(v0 + 2))], "k: long, v: string, version: long"
    )
    vt = t.append_ops(ops)
    assert vt == v0 + 2
    live = _live(t)
    assert live[1] == "one" and 2 not in live and live[3] == "v3"


def test_time_travel_across_append_writes(spark, tmp_path):
    t = _mk(spark, tmp_path, n=6)
    t.update_where(F.col("k") == 0, {"v": F.lit("zero")}, mode="append")
    mark = t.max_version()
    t.delete_where(F.col("k") == 1, mode="append")
    t.upsert(spark.createDataFrame([(77, "late")], "k: long, v: string"), mode="append")
    tt = {r["k"]: r["v"] for r in t.live_as_of(mark).collect()}
    assert tt[0] == "zero" and 1 in tt and 77 not in tt


def test_vacuum_with_pending_overlay(spark, tmp_path):
    """vacuum under a pending overlay: monotonic ct means folded-bucket
    rewrites can't resurrect changelog rows, and the live view stays
    exactly the overlay semantics before and after."""
    t = _mk(spark, tmp_path, n=30, num_buckets=4)
    t.delete_where(F.col("k") < 5, mode="merge")   # tombstones v31..35
    horizon = t.max_version()
    t.update_where(F.col("k") == 9, {"v": F.lit("nine")}, mode="append")
    t.delete_where(F.col("k") == 10, mode="append")
    before = _live(t)
    removed = t.vacuum(horizon)
    assert removed == 5  # the five merged tombstones are physically gone
    assert _live(t) == before
    # overlay still pending (vacuum is not a fold), and folding after
    # the vacuum converges to the same state
    t.compact()
    assert _live(t) == before
    # the appended tombstone for k=10 is still a tombstone (not vacuumed
    # — it is above the horizon)
    snap = {r["k"]: r["version"] for r in t.snapshot().collect()}
    assert snap[10] < 0


def test_replicate_skips_fenced_ranges(spark, tmp_path, monkeypatch):
    """The streaming edit-log applier must not replay a crashed
    writer's fenced changelog rows into a replica."""
    from adfs_spark.streaming.loops import replicate

    t = _mk(spark, tmp_path, n=6, name="master")
    v0 = t.max_version()
    # crashed append: rows land in the changelog, publish fails, the
    # failure handler fences them
    real = VersionedTable._mark_visible

    def boom(self, vt_new):
        raise RuntimeError("crash")

    monkeypatch.setattr(VersionedTable, "_mark_visible", boom)
    with pytest.raises(RuntimeError):
        t.upsert(
            spark.createDataFrame([(99, "GHOST")], "k: long, v: string"), mode="append"
        )
    monkeypatch.setattr(VersionedTable, "_mark_visible", real)
    t.upsert(spark.createDataFrame([(2, "two")], "k: long, v: string"), mode="append")

    replica = VersionedTable(spark, SPEC, str(tmp_path / "replica"))
    replica.init()
    sq = replicate(t, replica, str(tmp_path / "ckpt"))
    sq.awaitTermination()
    live = {r["k"]: r["v"] for r in replica.live().collect()}
    assert 99 not in live          # fenced row never replicated
    assert live[2] == "two"        # committed append replicated
    assert live[0] == "v0"


def test_append_ops_below_horizon_folds_lww(spark, tmp_path):
    """ADVICE r4: ops whose abs(version) <= compacted_through cannot
    publish through the watermark (the overlay reads only (ct, vt]) —
    append_ops must fold them through the LWW merge path instead, so a
    replica replaying an older-versioned op after a compact neither
    loses the update nor resurrects overwritten state."""
    t = _mk(spark, tmp_path, n=5)
    t.update_where(F.col("k") == 2, {"v": F.lit("newer")}, mode="merge")
    t.compact()
    ct = t._overlay_meta()["compacted_through"]
    stored = {r["k"]: r["version"] for r in t.snapshot().collect()}
    assert ct == max(stored.values()) == stored[2]
    # replayed op BELOW the horizon, newer than k=3's stored version:
    # must win; replayed op older than k=2's stored version: must lose
    ops = spark.createDataFrame(
        [(3, "replayed-win", ct), (2, "replayed-lose", 1)],
        "k: long, v: string, version: long",
    )
    t.append_ops(ops)
    live = _live(t)
    assert live[3] == "replayed-win"
    assert live[2] == "newer"
    # mixed batch: below-horizon rows fold, above-horizon rows publish
    ct2 = t._overlay_meta()["compacted_through"]
    mixed = spark.createDataFrame(
        [(4, "old-win", stored[4] + 1), (0, "fresh", ct2 + 1)],
        "k: long, v: string, version: long",
    )
    assert stored[4] + 1 <= ct2
    vt = t.append_ops(mixed)
    assert vt >= ct2 + 1
    live = _live(t)
    assert live[4] == "old-win" and live[0] == "fresh"


def test_append_ops_below_horizon_rejected_in_open_txn(spark, tmp_path):
    from adfs_spark.storage import TransactionLog

    t = _mk(spark, tmp_path, n=5, name="enr")
    t.compact()
    ct = t._overlay_meta()["compacted_through"]
    log = TransactionLog(str(tmp_path / "txn"))
    log.enroll(t)
    ops = spark.createDataFrame([(1, "old", ct)], "k: long, v: string, version: long")
    with pytest.raises(ValueError, match="below-horizon"):
        with log.transaction():
            t.append_ops(ops)


def test_overlay_autofold_bounds_pending_tail(spark, tmp_path):
    """ADVICE r4: the pending overlay is bounded — once vt - ct exceeds
    append_threshold * overlay_fold_factor, the next append-routed
    write folds instead of growing it, so a long append streak can
    never make the read-side overlay broadcast unbounded."""
    t = _mk(spark, tmp_path, n=40, num_buckets=4)
    t.append_threshold = 5
    t.overlay_fold_factor = 2          # bound = 10 pending versions
    for i in range(6):                 # 6 x 3-row appends = 18 versions
        t.update_where(
            F.col("k").isin([i, i + 10, i + 20]),
            {"v": F.lit(f"b{i}")},
            mode="append",
        )
        m = t._overlay_meta()
        assert m["visible_through"] - m["compacted_through"] <= 10 + 3
    # semantics unchanged by the interleaved folds
    live = _live(t)
    for i in range(6):
        assert live[i] == f"b{i}" and live[i + 10] == f"b{i}"


def test_fences_pruned_after_fold(spark, tmp_path, monkeypatch):
    """VERDICT r4 #8: a crash-heavy history must not grow the fence
    list without bound — once a fold passes a fenced range, its orphan
    rows are physically deleted from the changelog and the fence entry
    dropped; delta()/time-travel stay orphan-free afterwards."""
    t = _mk(spark, tmp_path, n=8)
    real = VersionedTable._mark_visible

    def boom(self, vt_new):
        raise RuntimeError("crash")

    for i in range(3):  # three crashed appends -> three fences
        monkeypatch.setattr(VersionedTable, "_mark_visible", boom)
        with pytest.raises(RuntimeError):
            t.upsert(
                spark.createDataFrame([(90 + i, "GHOST")], "k: long, v: string"),
                mode="append",
            )
        monkeypatch.setattr(VersionedTable, "_mark_visible", real)
        t.upsert(
            spark.createDataFrame([(i, f"ok{i}")], "k: long, v: string"),
            mode="append",
        )
    assert len(t._overlay_meta()["aborted"]) == 3
    vmax = t.max_version()
    t.compact()
    meta = t._overlay_meta()
    assert meta["aborted"] == []                       # fences retired
    assert meta["compacted_through"] >= vmax
    # the orphan rows are PHYSICALLY gone: a raw changelog scan finds
    # no ghost keys, so time travel needs no fence predicate to be right
    ghosts = t.changelog().filter(F.col("k") >= 90).count()
    assert ghosts == 0
    d = {r["k"] for r in t.delta(1, vmax).collect()}
    assert d == set(range(8)) | {0, 1, 2}
    live = _live(t)
    assert live[0] == "ok0" and live[2] == "ok2" and 90 not in live


def test_fences_pruned_in_txn_manifest(spark, tmp_path, monkeypatch):
    """Enrolled tables: retired fences leave the manifest too (staged
    through the open transaction's commit)."""
    from adfs_spark.storage import TransactionLog

    t = _mk(spark, tmp_path, n=6, name="mf")
    log = TransactionLog(str(tmp_path / "txnp"))
    log.enroll(t)
    # a failed verb fences its appended tail in the manifest
    with pytest.raises(RuntimeError):
        with log.transaction():
            t.upsert(spark.createDataFrame([(50, "X")], "k: long, v: string"))
            raise RuntimeError("verb failed")
    assert log.latest()["tables"]["ovl"]["aborted"]
    t.upsert(spark.createDataFrame([(1, "one")], "k: long, v: string"))
    t.compact()
    assert log.latest()["tables"]["ovl"].get("aborted", []) == []
    assert t._overlay_meta()["aborted"] == []
    live = _live(t)
    assert live[1] == "one" and 50 not in live


def test_replicate_defers_unpublished_rows(spark, tmp_path):
    """ADVICE r4: the streaming applier must gate on the source's
    visibility watermark — rows a writer appended but never published
    must NOT reach the replica, and must flow once published."""
    from adfs_spark.streaming.loops import replicate

    t = _mk(spark, tmp_path, n=4, name="m2")
    v0 = t.max_version()
    # stage an UNPUBLISHED append (changelog rows exist, no watermark
    # bump, no fence yet — the exact crash window)
    rows = spark.createDataFrame(
        [(9, "pending", v0 + 1)], "k: long, v: string, version: long"
    )
    t._append_changelog(rows.withColumn(OP_COL, F.lit("UPSERT")))
    replica = VersionedTable(spark, SPEC, str(tmp_path / "rep2"))
    replica.init()
    sq = replicate(t, replica, str(tmp_path / "ck2"))
    sq.awaitTermination()
    live = {r["k"]: r["v"] for r in replica.live().collect()}
    assert 9 not in live                  # unpublished row deferred
    assert live[0] == "v0"
    # now publish it and write one more row; the stream catches up
    t._mark_visible(v0 + 1)
    t.upsert(spark.createDataFrame([(8, "eight")], "k: long, v: string"), mode="append")
    sq = replicate(t, replica, str(tmp_path / "ck2"))
    sq.awaitTermination()
    live = {r["k"]: r["v"] for r in replica.live().collect()}
    assert live[9] == "pending" and live[8] == "eight"


def test_auto_mode_mor_routes_spread_batch_to_append(spark, tmp_path):
    """Round-6 merge-on-read tier: an auto-routed batch LARGER than
    append_threshold but within mor_tail_fraction of the folded rows
    stays changelog-resident (O(batch) write, no bucket rewrite);
    a batch past the bound still folds.  Reads are identical either
    way — the overlay merge is semantically invisible."""
    t = _mk(spark, tmp_path, n=400, num_buckets=4)
    t.append_threshold = 10      # force past the driver-append tier
    t.overlay_fold_factor = 2    # absolute bound = 20
    t.mor_tail_fraction = 0.1    # scale bound = 0.1 * 400 = 40
    # 30-row spread update: > threshold (10), <= bound (40) -> append
    t.update_where(F.col("k") % 13 == 0, {"v": F.lit("mor")}, mode="auto")
    m = t._overlay_meta()
    assert m["visible_through"] > m["compacted_through"], "stayed changelog-resident"
    assert t.last_write_phases.get("route") == "auto->append"
    live = _live(t)
    assert all(v == "mor" for k, v in live.items() if k % 13 == 0)
    assert len(live) == 400
    # a second big batch would push the tail past 40 -> folds
    t.update_where(F.col("k") % 13 == 1, {"v": F.lit("fold")}, mode="auto")
    assert t.last_write_phases.get("route") == "auto->merge"
    m = t._overlay_meta()
    assert m["visible_through"] == m["compacted_through"]
    # the fold carried the first batch down with it
    live = _live(t)
    assert all(v == "mor" for k, v in live.items() if k % 13 == 0)
    assert all(v == "fold" for k, v in live.items() if k % 13 == 1)
    # merge evidence recorded: spread update touched every bucket
    assert t.last_merge_stats["touched_fraction"] == 1.0


def test_group_upsert_equals_serial_appends(spark, tmp_path):
    """k batches through ONE group commit read back identically to k
    serial append-mode upserts: same live view, same max version, same
    per-batch version boundaries (delta over any prefix matches)."""
    g = _mk(spark, tmp_path, name="g")
    s = _mk(spark, tmp_path, name="s")
    batches = [
        spark.createDataFrame([(100 + i, f"g{i}")], "k: long, v: string")
        for i in range(6)
    ]
    vt_g = g.group_upsert(batches)
    for b in batches:
        vt_s = s.upsert(b, mode="append")
    assert _live(g) == _live(s)
    assert vt_g == vt_s
    assert g.max_version() == s.max_version()
    # one commit object for the whole group vs six
    assert g.last_commit_id() < s.last_commit_id()
    ph = g.last_write_phases
    assert ph["n_ops"] == 6 and "publish_sec" in ph


def test_group_upsert_same_key_lww_order(spark, tmp_path):
    """Two group batches hitting the SAME key resolve in submission
    order (later batch wins LWW), exactly like serial commits."""
    t = _mk(spark, tmp_path, name="lww")
    t.group_upsert(
        [
            spark.createDataFrame([(3, "first")], "k: long, v: string"),
            spark.createDataFrame([(3, "second")], "k: long, v: string"),
        ]
    )
    assert _live(t)[3] == "second"


@pytest.mark.parametrize("num_buckets", [0, 8])
def test_group_point_update_equals_serial_update_where(
    spark, tmp_path, num_buckets
):
    """k point updates through ONE group_point_update (one bucket-pruned
    read job, one commit cycle) read back identically to k serial
    append-mode update_where calls: same live view, same max version —
    including a missing key (no-op) and cross-op read-your-writes on a
    shared key."""
    g = _mk(spark, tmp_path, n=40, num_buckets=num_buckets, name="g")
    s = _mk(spark, tmp_path, n=40, num_buckets=num_buckets, name="s")
    ops = [
        ([3], {"v": "a"}),
        ([7, 9], {"v": "b"}),
        ([3], {"v": "c"}),          # same key again: later op wins
        ([999], {"v": "ghost"}),    # missing key: no-op
        ([12], {"v": "d"}),
    ]
    vt_g = g.group_point_update(ops)
    vt_s = None
    for keys, assigns in ops:
        vt_s = s.update_where(
            F.col("k").isin(keys),
            {c: F.lit(v) for c, v in assigns.items()},
            mode="append",
        )
    assert _live(g) == _live(s)
    assert vt_g == vt_s
    assert g.max_version() == s.max_version()
    assert _live(g)[3] == "c" and 999 not in _live(g)
    # one commit object for the whole group vs five
    assert g.last_commit_id() < s.last_commit_id()
    assert g.last_write_phases["n_ops"] == 5


def test_group_point_update_multi_column_and_composite_state(spark, tmp_path):
    """Assignments touch a subset of columns; untouched columns carry
    the CURRENT value forward (read-modify-write), and an op sees the
    column writes of earlier ops in the same group."""
    t = _mk(spark, tmp_path, n=10, num_buckets=4, name="rmw")
    t.group_point_update(
        [
            ([5], {"v": "first"}),
            ([5], {}),  # no-op assignment still re-stamps the CURRENT row
        ]
    )
    assert _live(t)[5] == "first"  # second op read the first op's write


def test_group_point_update_oversize_rejected(spark, tmp_path):
    """A group beyond the driver small-batch bound fails atomically."""
    t = _mk(spark, tmp_path, n=20, name="big2")
    t.append_threshold = 3
    vt0 = t.max_version()
    with pytest.raises(ValueError, match="small-batch bound"):
        t.group_point_update([(list(range(10)), {"v": "x"})])
    with pytest.raises(ValueError, match="append_threshold"):
        t.group_point_update(
            [([0, 1], {"v": "y"}), ([2, 3, 4, 5], {"v": "z"})]
        )
    assert t.max_version() == vt0


def test_group_upsert_oversize_batch_rejected(spark, tmp_path):
    """A batch beyond the driver small-batch bound fails the whole
    group atomically (no partial commit, no burned versions)."""
    t = _mk(spark, tmp_path, name="big")
    vt0 = t.max_version()
    big = spark.range(0, t.append_threshold + 10).select(
        F.col("id").alias("k"), F.lit("x").alias("v")
    )
    ok = spark.createDataFrame([(200, "ok")], "k: long, v: string")
    with pytest.raises(ValueError, match="append_threshold"):
        t.group_upsert([ok, big])
    assert t.max_version() == vt0
    assert 200 not in _live(t)
