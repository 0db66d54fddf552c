from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.operators.delta import changelog_of, merge_last_writer_wins, version_range
from adfs_spark.schema import ColumnSpec, TableSpec
from adfs_spark.storage import VersionedTable

SPEC = TableSpec(
    name="kv",
    columns=(ColumnSpec("k", "long"), ColumnSpec("v", "string")),
    primary_key=("k",),
    versioned=True,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = VersionedTable(spark, SPEC, str(tmp_path / "kv"))
    rows = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k: long, v: string")
    t.init(rows)
    return t


def test_init_and_live(table):
    assert table.count() == 3
    assert table.max_version() == 3


def test_upsert_replace_and_insert(table, spark):
    table.upsert(spark.createDataFrame([(2, "B"), (4, "d")], "k: long, v: string"))
    live = {r["k"]: r["v"] for r in table.live().collect()}
    assert live == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert table.max_version() == 5


def test_upsert_no_overwrite_raises(table, spark):
    with pytest.raises(ValueError):
        table.upsert(
            spark.createDataFrame([(1, "clash")], "k: long, v: string"), overwrite=False
        )


def test_update_where(table):
    table.update_where(F.col("k") >= 2, {"v": F.upper(F.col("v"))})
    live = {r["k"]: r["v"] for r in table.live().collect()}
    assert live == {1: "a", 2: "B", 3: "C"}


def test_delete_tombstone(table):
    table.delete_where(F.col("k") == 2)
    assert table.count() == 2
    snap = {r["k"]: r["version"] for r in table.snapshot().collect()}
    assert snap[2] < 0  # tombstone kept


def test_delta_and_lww_merge(table, spark):
    table.upsert(spark.createDataFrame([(2, "B2")], "k: long, v: string"))
    table.delete_where(F.col("k") == 1)
    d = table.delta(4, 5)
    assert d.count() == 2
    # replica catch-up: start from the v3 snapshot, merge the delta
    base = table.changelog().filter(F.abs(F.col("version")) <= 3).drop("_op", "_vbucket")
    merged = merge_last_writer_wins(base, d.drop("_op"), ["k"])
    live = {r["k"]: r["v"] for r in merged.filter(F.col("version") >= 0).collect()}
    assert live == {2: "B2", 3: "c"}


def test_time_travel_snapshot_as_of(table, spark):
    # state at v3: {1:a, 2:b, 3:c}; v4 upserts 2→B2; v5 tombstones 1
    table.upsert(spark.createDataFrame([(2, "B2")], "k: long, v: string"))
    table.delete_where(F.col("k") == 1)
    as_of_3 = {r["k"]: r["v"] for r in table.live_as_of(3).collect()}
    assert as_of_3 == {1: "a", 2: "b", 3: "c"}
    as_of_4 = {r["k"]: r["v"] for r in table.live_as_of(4).collect()}
    assert as_of_4 == {1: "a", 2: "B2", 3: "c"}
    as_of_5 = {r["k"]: r["v"] for r in table.live_as_of(5).collect()}
    assert as_of_5 == {2: "B2", 3: "c"}
    # tombstone visible in the raw snapshot
    snap5 = {r["k"]: r["version"] for r in table.snapshot_as_of(5).collect()}
    assert snap5[1] == -5
    # as-of now == current live view
    cur = {r["k"]: r["v"] for r in table.live().collect()}
    assert {r["k"]: r["v"] for r in table.live_as_of(table.max_version()).collect()} == cur


def test_rollback_to(table, spark):
    # v3 state: {1:a, 2:b, 3:c} → upsert 2→B2, insert 4, delete 1
    table.upsert(spark.createDataFrame([(2, "B2"), (4, "d")], "k: long, v: string"))
    table.delete_where(F.col("k") == 1)
    assert {r["k"]: r["v"] for r in table.live().collect()} == {2: "B2", 3: "c", 4: "d"}
    table.rollback_to(3)
    assert {r["k"]: r["v"] for r in table.live().collect()} == {1: "a", 2: "b", 3: "c"}
    # forward-written: history after the rollback still shows the detour
    assert {r["k"]: r["v"] for r in table.live_as_of(6).collect()} == {
        2: "B2", 3: "c", 4: "d",
    }
    # idempotent: rolling back again is a no-op
    v = table.max_version()
    table.rollback_to(3)
    assert table.max_version() == v


def test_sync_from(table, spark, tmp_path):
    table.upsert(spark.createDataFrame([(5, "e")], "k: long, v: string"))
    replica = VersionedTable(spark, SPEC, str(tmp_path / "replica"))
    replica.sync_from(table)
    assert {r["k"] for r in replica.live().collect()} == {1, 2, 3, 5}


def test_apply_directly_idempotent(table, spark):
    ops = spark.createDataFrame([(1, "old", 1)], "k: long, v: string, version: long")
    table.apply_directly(ops)  # version 1 ≤ stored version → no change
    assert {r["v"] for r in table.live().filter("k=1").collect()} == {"a"}


def test_changelog_classification(spark):
    log = spark.createDataFrame(
        [(1, "a", 1), (1, "a2", 3), (2, "b", 2), (2, None, -4)],
        "k: long, v: string, version: long",
    )
    ops = {(r["k"], r["version"]): r["_op"] for r in changelog_of(log, ["k"]).collect()}
    assert ops[(1, 1)] == "INSERT" and ops[(1, 3)] == "UPDATE" and ops[(2, -4)] == "DELETE"


def test_bucketed_incremental_merge(spark, tmp_path):
    import os

    t = VersionedTable(spark, SPEC, str(tmp_path / "bkv"), num_buckets=8)
    rows = spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k: long, v: string")
    t.init(rows)
    assert t.count() == 50 and t.max_version() == 50
    # incremental upsert touches few buckets
    t.upsert(spark.createDataFrame([(3, "V3"), (99, "new")], "k: long, v: string"))
    live = {r["k"]: r["v"] for r in t.live().collect()}
    assert live[3] == "V3" and live[99] == "new" and len(live) == 51
    # tombstone + idempotent apply still correct through the bucketed path
    t.delete_where(F.col("k") == 7)
    assert t.count() == 50
    t.apply_directly(
        spark.createDataFrame([(3, "stale", 1)], "k: long, v: string, version: long")
    )
    assert {r["v"] for r in t.live().filter("k=3").collect()} == {"V3"}
    # physical layout: bucket partition dirs exist
    parts = [d for d in os.listdir(t.current_path) if d.startswith("_kb=")]
    assert 1 <= len(parts) <= 8


def test_bucketed_matches_unbucketed(spark, tmp_path):
    a = VersionedTable(spark, SPEC, str(tmp_path / "a"))
    b = VersionedTable(spark, SPEC, str(tmp_path / "b"), num_buckets=4)
    rows = spark.createDataFrame([(i, f"x{i}") for i in range(20)], "k: long, v: string")
    for t in (a, b):
        t.init(rows)
        t.upsert(spark.createDataFrame([(5, "up")], "k: long, v: string"))
        t.delete_where(F.col("k") % 9 == 0)
    canon = lambda t: sorted(map(tuple, t.snapshot().collect()))
    assert canon(a) == canon(b)


def test_version_range(spark):
    log = spark.createDataFrame(
        [(1, 1), (2, -2), (3, 3), (4, 4)], "k: long, version: long"
    )
    got = sorted(r["k"] for r in version_range(log, 2, 3).collect())
    assert got == [2, 3]


def test_observed_op_counters(spark):
    from pyspark.sql import functions as F

    from adfs_spark.metrics import collect_metrics, observed

    df = spark.range(100).withColumn(
        "version", F.when(F.col("id") % 10 == 0, -F.col("id") - 1).otherwise(F.col("id"))
    )
    wrapped, obs = observed(df, "scan", version_col="version")
    assert wrapped.count() == 100  # action triggers metric collection
    got = collect_metrics(obs)
    assert got["n_rows"] == 100
    assert got["n_live"] == 90
    assert got["n_tombstone"] == 10


def test_compact_preserves_bucketed_layout(spark, tmp_path):
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable

    spec = TableSpec(
        name="t",
        columns=(
            ColumnSpec("id", "long", nullable=False),
            ColumnSpec("val", "string"),
            ColumnSpec("version", "long"),
        ),
        primary_key=("id",),
    )
    vt = VersionedTable(spark, spec, str(tmp_path / "t"), num_buckets=4)
    vt.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id: long, val: string")
    )
    vt.compact()
    assert vt.live().count() == 100
    # the regression: a bucket-pruned merge after compact must still
    # see the other 99 rows
    vt.upsert(spark.createDataFrame([(5, "NEW")], "id: long, val: string"), overwrite=True)
    assert vt.live().count() == 100
    assert vt.live().filter("id=5").first()["val"] == "NEW"


def test_compact_zorder(spark, tmp_path):
    from pyspark.sql import functions as F

    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable

    spec = TableSpec(
        name="t",
        columns=(
            ColumnSpec("id", "long", nullable=False),
            ColumnSpec("x", "long"),
            ColumnSpec("y", "long"),
            ColumnSpec("version", "long"),
        ),
        primary_key=("id",),
    )
    rows = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 40503) % 1000).alias("y"),
    )
    for buckets in (0, 4):
        vt = VersionedTable(
            spark, spec, str(tmp_path / f"t{buckets}"), num_buckets=buckets
        )
        vt.init(rows)
        vt.compact(zorder_cols=("x", "y"))
        assert vt.live().count() == 2000
        assert vt.live().filter("x = 7").count() == rows.filter("x = 7").count()
        vt.upsert(
            spark.createDataFrame([(3, 1, 1)], "id: long, x: long, y: long"),
            overwrite=True,
        )
        assert vt.live().count() == 2000


def test_vacuum_drops_tombstones_physically(spark, tmp_path):
    from pyspark.sql import functions as F

    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable

    spec = TableSpec(
        name="t",
        columns=(
            ColumnSpec("id", "long", nullable=False),
            ColumnSpec("val", "string"),
            ColumnSpec("version", "long"),
        ),
        primary_key=("id",),
    )
    for buckets in (0, 4):
        vt = VersionedTable(spark, spec, str(tmp_path / f"v{buckets}"), num_buckets=buckets)
        vt.init(spark.createDataFrame([(i, f"v{i}") for i in range(40)], "id: long, val: string"))
        vt.delete_where(F.col("id") % 4 == 0)  # 10 tombstones
        assert vt.live().count() == 30
        assert vt.snapshot().count() == 40  # tombstones physically present
        horizon = vt.max_version()
        removed = vt.vacuum(horizon)
        assert removed == 10
        assert vt.snapshot().count() == 30  # physically gone
        assert vt.live().count() == 30  # live view unchanged
        # table still writable afterwards
        vt.upsert(spark.createDataFrame([(0, "back")], "id: long, val: string"), overwrite=True)
        assert vt.live().count() == 31


def test_vacuum_fully_tombstoned_bucket_and_changelog_prune(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VBUCKET_SIZE, VersionedTable

    spec = TableSpec(
        name="t",
        columns=(
            ColumnSpec("id", "long", nullable=False),
            ColumnSpec("val", "string"),
            ColumnSpec("version", "long"),
        ),
        primary_key=("id",),
    )
    vt = VersionedTable(spark, spec, str(tmp_path / "t"), num_buckets=2)
    vt.init(spark.createDataFrame([(i, "x") for i in range(20)], "id: long, val: string"))
    # tombstone EVERYTHING: both buckets become pure-tombstone
    vt.delete_where(F.lit(True))
    assert vt.live().count() == 0 and vt.snapshot().count() == 20
    removed = vt.vacuum(vt.max_version(), prune_changelog=True)
    assert removed == 20
    assert vt.snapshot().count() == 0
    # changelog horizon: version buckets fully below horizon would be
    # pruned (all versions here are far below one VBUCKET_SIZE, so the
    # single bucket 0 survives unless the horizon covers it entirely)
    assert vt.max_version() >= 0  # table still readable
    vt.upsert(spark.createDataFrame([(1, "y")], "id: long, val: string"), overwrite=True)
    assert vt.live().count() == 1


def test_concurrent_writers_both_land(spark, tmp_path):
    """U6 analog (DistributedLocker.java:103-160): two interleaved
    writers race on the same bucketed table; the loser's commit
    reservation fails, it retries against the winner's state, and BOTH
    writes land with unique versions and sequential commit ids."""
    import threading

    t = VersionedTable(spark, SPEC, str(tmp_path / "ccr"), num_buckets=4)
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "k: long, v: string"))

    errs: list[Exception] = []

    def writer(rows):
        try:
            t.upsert(spark.createDataFrame(rows, "k: long, v: string"))
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    # same pk-hash space — writers collide on buckets, not just the lock
    t1 = threading.Thread(target=writer, args=([(1, "A1"), (10, "x")],))
    t2 = threading.Thread(target=writer, args=([(2, "B2"), (11, "y")],))
    t1.start(); t2.start(); t1.join(); t2.join()

    assert not errs
    live = {r["k"]: r["v"] for r in t.live().collect()}
    assert live == {1: "A1", 2: "B2", 10: "x", 11: "y"}
    # versions unique (no concurrent stamping overlap)
    versions = [r["version"] for r in t.snapshot().collect()]
    assert len(versions) == len(set(versions))
    # commit sequence: INIT + 2 upserts = 3 sequential commits
    assert t.last_commit_id() == 3


def test_failed_write_releases_reservation(spark, tmp_path):
    t = VersionedTable(spark, SPEC, str(tmp_path / "rel"))
    t.init(spark.createDataFrame([(1, "a")], "k: long, v: string"))
    with pytest.raises(ValueError):
        t.upsert(
            spark.createDataFrame([(1, "dup")], "k: long, v: string"),
            overwrite=False,
        )
    # the aborted upsert burned no commit id and left no lock
    assert t.last_commit_id() == 1
    t.upsert(spark.createDataFrame([(2, "b")], "k: long, v: string"))
    assert t.last_commit_id() == 2
    assert t.count() == 2


def test_point_lookup_bucketed_prunes_partitions(spark, tmp_path):
    """point_lookup must (a) return exactly the requested live keys and
    (b) scan ONLY the touched bucket directories — the physical
    bucket-pruning contract that makes a point read O(|keys|/buckets)
    of the table instead of a full scan.  Since r8 the pruning happens
    at PATH level (the scan's file index is built from the touched
    bucket dirs, skipping the full-table listing a partition filter
    still pays), so the plan shows an |touched-buckets|-path file index
    plus the pushed pk In-filter."""
    from adfs_spark.functions import xxh

    t = VersionedTable(spark, SPEC, str(tmp_path / "kvb"), num_buckets=8)
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k: long, v: string"
    )
    t.init(rows)
    t.delete_where(F.col("k") == 7)

    out = t.point_lookup([3, 7, 42, 999])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {3: "v3", 42: "v42"}  # 7 tombstoned, 999 absent

    plan = out._jdf.queryExecution().executedPlan().toString()
    n_buckets = len({xxh.kbucket_of((k,), 8) for k in (3, 7, 42, 999)})
    assert f"InMemoryFileIndex({n_buckets} paths)" in plan, (
        "point_lookup scan is not path-pruned to the touched buckets:\n"
        + plan
    )
    assert "In(k, [" in plan, (
        "point_lookup lost the pushed pk In-filter:\n" + plan
    )


def test_point_lookup_routes_by_batch_size(spark, tmp_path):
    """r8 regression pin: the literal-In + direct-path fast path is for
    SMALL key sets (the group-commit read); a big batch whose keys
    cover every bucket must route back to the broadcast semi-join over
    the partition-filtered full-table scan — per-call dir probes plus
    a 2,000-literal In ran the open/close bench 3× slower than the
    join it replaced.  Both routes must return identical rows."""
    t = VersionedTable(spark, SPEC, str(tmp_path / "kvroute"), num_buckets=8)
    n = 4000
    t.init(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(n)], "k: long, v: string"
        )
    )

    # small batch (20 keys, ≤64): literal In + direct-path bucket dirs
    small_keys = list(range(0, 200, 10))
    small = t.point_lookup(small_keys)
    plan_s = small._jdf.queryExecution().executedPlan().toString()
    assert "In(k, [" in plan_s, (
        "small-batch point read lost the literal pushed In:\n" + plan_s
    )
    assert "BroadcastHashJoin" not in plan_s, (
        "small-batch point read should not pay a broadcast exchange:\n"
        + plan_s
    )
    assert {r["k"] for r in small.collect()} == set(small_keys)

    # big batch (2000 keys, full bucket coverage): broadcast semi-join
    # over ONE full-table listing, no per-bucket path fan-out
    big_keys = list(range(0, n, 2))
    big = t.point_lookup(big_keys)
    plan_b = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b and "LeftSemi" in plan_b, (
        "big-batch point read must route to the broadcast semi-join:\n"
        + plan_b
    )
    assert "In(k, [" not in plan_b, (
        "big-batch point read must not build a 2000-literal In:\n"
        + plan_b
    )
    assert big.count() == len(big_keys)


def test_point_lookup_unbucketed_and_composite(spark, tmp_path):
    spec2 = TableSpec(
        name="kv2",
        columns=(
            ColumnSpec("a", "long"),
            ColumnSpec("b", "string"),
            ColumnSpec("v", "string"),
        ),
        primary_key=("a", "b"),
        versioned=True,
    )
    t = VersionedTable(spark, spec2, str(tmp_path / "kv2"))
    t.init(
        spark.createDataFrame(
            [(1, "x", "1x"), (1, "y", "1y"), (2, "x", "2x")],
            "a: long, b: string, v: string",
        )
    )
    out = t.point_lookup([(1, "y"), (2, "x"), (9, "z")])
    assert {(r["a"], r["b"]) for r in out.collect()} == {(1, "y"), (2, "x")}


def test_merge_swap_touched_buckets_only(spark, tmp_path):
    """r9: the merge commit stages final files then swaps touched
    bucket DIRECTORIES in by rename — untouched buckets' files must be
    physically untouched (same file names), touched buckets must hold
    exactly one fresh file, and helper/extra columns must never land
    in current/."""
    import glob
    import os

    t = VersionedTable(spark, SPEC, str(tmp_path / "kvb"), num_buckets=8)
    t.init(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(64)], "k: long, v: string"
        )
    )
    before = {
        d: sorted(os.listdir(os.path.join(t.current_path, d)))
        for d in os.listdir(t.current_path)
        if d.startswith("_kb=")
    }
    # one-key point upsert → exactly one touched bucket
    t.upsert(spark.createDataFrame([(5, "V5")], "k: long, v: string"), mode="merge")
    after = {
        d: sorted(os.listdir(os.path.join(t.current_path, d)))
        for d in os.listdir(t.current_path)
        if d.startswith("_kb=")
    }
    assert set(before) == set(after)
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1, f"expected 1 swapped bucket dir, got {changed}"
    files = glob.glob(os.path.join(t.current_path, changed[0], "*.parquet"))
    assert len(files) == 1  # one file per touched bucket, any task count
    # schema of the swapped files is exactly the full table schema
    got = spark.read.parquet(files[0])
    assert set(got.columns) == {"k", "v", "version"}
    live = {r["k"]: r["v"] for r in t.live().collect()}
    assert live[5] == "V5" and len(live) == 64


def test_changelog_spec_with_declared_version_column(spark, tmp_path):
    """r10 (r9 advice): a spec may declare 'version' among its OWN
    columns (schema.py supports it); the changelog's explicit read
    schema must not then append a duplicate version field — the read
    worked under inference and must keep working."""
    spec = TableSpec(
        name="kv_declared_version",
        columns=(
            ColumnSpec("k", "long"),
            ColumnSpec("v", "string"),
            ColumnSpec("version", "long"),
        ),
        primary_key=("k",),
        versioned=True,
    )
    t = VersionedTable(spark, spec, str(tmp_path / "kvv"))
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "k: long, v: string"))
    t.upsert(spark.createDataFrame([(2, "B")], "k: long, v: string"))
    cl = t.changelog()
    assert [f.name for f in cl.schema.fields] == ["k", "v", "version", "_op", "_vbucket"]
    assert sorted(map(tuple, cl.select("k", "v", "version").collect())) == [
        (1, "a", 1), (2, "B", 3), (2, "b", 2)]
    # the pruned-range reader shares the membership check
    d = t.delta(2, 3)
    assert sorted(r["k"] for r in d.collect()) == [2, 2]
