from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.blockmap import BlockMap
from adfs_spark.namespace import Namespace
from adfs_spark.schema import BLOCK, DATANODE, LEASE
from adfs_spark.storage import VersionedTable
from adfs_spark.streaming.loops import replicate, windowed_event_counts


@pytest.fixture()
def bm(spark, tmp_path):
    ns = Namespace.create_at(spark, str(tmp_path / "fs"))
    blocks = VersionedTable(spark, BLOCK, str(tmp_path / "blocks"))
    blocks.init()
    datanodes = VersionedTable(spark, DATANODE, str(tmp_path / "dn"))
    datanodes.init()
    leases = VersionedTable(spark, LEASE, str(tmp_path / "lease"))
    leases.init()
    return BlockMap(ns, blocks, datanodes, leases)


def _dn_row(spark, id_, last_updated, name=None):
    return spark.createDataFrame(
        [
            (
                id_,
                name or f"dn{id_}:50010",
                f"storage-{id_}",
                50020,
                50075,
                10_000_000,
                1_000_000,
                9_000_000,
                last_updated,
                3,
                "/d1/r1",
                "NORMAL",
            )
        ],
        DATANODE.struct_type(include_version=False),
    )


def test_block_locations_lifecycle(bm, spark):
    bm.namespace.mkdirs("/data")
    fid = bm.namespace.create("/data/f")
    bm.heartbeat(_dn_row(spark, 1, 1000))
    bm.heartbeat(_dn_row(spark, 2, 2000))
    bm.allocate_block(fid, 100, 0, [1, 2])
    bm.allocate_block(fid, 101, 1, [1])
    locs = bm.get_block_locations("/data/f").collect()
    assert [r["block_id"] for r in locs] == [100, 101]
    assert locs[0]["datanode_name"] in ("dn1:50010", "dn2:50010")


def test_report_diff_and_expiry(bm, spark):
    bm.namespace.mkdirs("/d")
    fid = bm.namespace.create("/d/f")
    bm.allocate_block(fid, 7, 0, [1])
    reported = spark.createDataFrame(
        [(7, -1, 1), (8, 10, 1)], "id: long, length: long, generationStamp: long"
    )
    to_add, to_remove, mismatched = bm.process_report(1, reported)
    assert [r["id"] for r in to_add.collect()] == [8]
    assert to_remove.count() == 0
    assert mismatched.count() == 0
    # expiry scans
    now = 1_000_000
    bm.leases.upsert(
        spark.createDataFrame([("h1", 1000), ("h2", now)], "holder: string, time: long")
    )
    assert [r["holder"] for r in bm.expired_leases(now, 10_000).collect()] == ["h1"]
    bm.heartbeat(_dn_row(spark, 9, 5))
    dead = bm.dead_datanodes(now, 10_000)
    assert 9 in {r["id"] for r in dead.collect()}


def test_under_replicated_priorities(bm, spark):
    bm.namespace.mkdirs("/u")
    fid = bm.namespace.create("/u/f", replication=3)
    bm.allocate_block(fid, 201, 0, [1])          # 1 of 3 → priority 0
    bm.allocate_block(fid, 202, 1, [1, 2])       # 2 of 3 → priority 2
    got = {r["id"]: r["priority"] for r in bm.under_replicated_blocks().collect()}
    assert got[201] == 0 and got[202] == 2


def test_changelog_replication_stream(spark, tmp_path):
    from adfs_spark.schema import ColumnSpec, TableSpec

    spec = TableSpec(
        "kv", (ColumnSpec("k", "long"), ColumnSpec("v", "string")), ("k",), versioned=True
    )
    master = VersionedTable(spark, spec, str(tmp_path / "master"))
    master.init(spark.createDataFrame([(1, "a"), (2, "b")], "k: long, v: string"))
    master.upsert(spark.createDataFrame([(3, "c")], "k: long, v: string"))
    master.delete_where(F.col("k") == 1)

    replica = VersionedTable(spark, spec, str(tmp_path / "replica"))
    replica.init()
    q = replicate(master, replica, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    live = {r["k"]: r["v"] for r in replica.live().collect()}
    assert live == {2: "b", 3: "c"}


def test_heartbeat_applier_stream(spark, tmp_path):
    from adfs_spark.streaming.loops import heartbeat_applier

    datanodes = VersionedTable(spark, DATANODE, str(tmp_path / "dns"))
    datanodes.init()
    src = str(tmp_path / "hb_src")
    # two heartbeats for dn 1 (later lastUpdated must win), one for dn 2
    hb = _dn_row(spark, 1, 100).union(_dn_row(spark, 1, 200)).union(_dn_row(spark, 2, 150))
    hb.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        DATANODE.struct_type(include_version=False)
    ).parquet(src)
    q = heartbeat_applier(stream, datanodes, str(tmp_path / "hb_ckpt"))
    q.awaitTermination(120)
    live = {r["id"]: r["lastUpdated"] for r in datanodes.live().collect()}
    assert live == {1: 200, 2: 150}


def test_report_reconciler_stream(bm, spark, tmp_path):
    """D7 streaming form: block reports arriving as a stream are
    classified added/removed/corrupt/ok against stored state."""
    from adfs_spark.streaming.loops import report_reconciler

    # stored: dn1 holds blocks 1 (gs=5) and 2 (gs=7)
    bm.blocks.init(
        spark.createDataFrame(
            [(1, 1, 100, 5, 10, 0), (2, 1, 200, 7, 10, 1)],
            BLOCK.struct_type(include_version=False),
        )
    )
    # report: block 1 ok, block 2 stale genstamp, block 9 unknown
    rep = spark.createDataFrame(
        [(1, 1, 100, 5), (1, 2, 200, 6), (1, 9, 50, 1)],
        "datanodeId: long, id: long, length: long, generationStamp: long",
    )
    src = str(tmp_path / "reports")
    rep.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "datanodeId long, id long, length long, generationStamp long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_path = str(tmp_path / "verdicts")
    q = report_reconciler(stream, bm.blocks, out_path, str(tmp_path / "ck"))
    q.awaitTermination(180)
    got = {(r["datanodeId"], r["id"]): r["class"] for r in spark.read.parquet(out_path).collect()}
    assert got == {(1, 1): "ok", (1, 2): "corrupt", (1, 9): "added"}


def test_multimodal_resize_passthrough_for_undecodable(spark, tables):
    """resize_images is REAL for BMP payloads (round 2, pure-numpy
    decode); non-BMP payloads pass through unchanged instead of
    raising — the text-byte documents here are not images."""
    from adfs_spark.functions.multimodal import from_documents, resize_images

    media = from_documents(tables["documents"].limit(2))
    before = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = resize_images(media, 64, 64).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == before


def test_windowed_event_counts_streaming(spark, sf_dir, tmp_path):
    from adfs_spark.catalog import load_table

    batch = load_table(spark, sf_dir, "events")
    expected = (
        batch.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .count()
        .count()
    )
    # batch-mode window agg
    got_batch = windowed_event_counts(batch)
    assert got_batch.count() == expected

    # streaming mode over a parquet dir copy
    src = str(tmp_path / "events_stream")
    batch.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # append mode only emits windows below the watermark; just assert the
    # stream ran and produced a sane subset
    n = spark.sql("select count(*) from win_counts").first()[0]
    assert 0 <= n <= expected


def test_sliding_windows_and_watermark_eviction(spark, tmp_path):
    """Sliding windows double-count each event into window/slide
    buckets, and a watermark drops events arriving far behind the
    stream's max event time."""
    import datetime as dt

    T0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    schema = "ts timestamp, event_type string, value double"
    recent = spark.createDataFrame(
        [(T0 + dt.timedelta(hours=h), "click", 1.0) for h in range(5)], schema
    )
    # batch mode: 1h windows sliding 30m → each event in 2 windows
    slid = windowed_event_counts(
        recent, window="1 hour", slide="30 minutes", key_col="event_type"
    )
    assert slid.agg(F.sum("n")).first()[0] == 2 * 5

    src = str(tmp_path / "ev_src")
    recent.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(recent.schema).parquet(src)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .start()
    )
    try:
        q.processAllAvailable()  # watermark advances to T0+4h − 2h = T0+2h
        late = spark.createDataFrame(
            [(T0 - dt.timedelta(hours=6), "click", 1.0),   # far below watermark
             (T0 + dt.timedelta(hours=6), "click", 1.0)],  # advances the stream
            schema,
        )
        late.write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "select window_start, n from wm_evict order by window_start"
    ).collect()
    starts = {r["window_start"] for r in rows}
    # the late event's window (T0-6h) was evicted, never emitted
    assert (T0 - dt.timedelta(hours=6)) not in starts
    # closed windows from the first batch were emitted exactly once
    assert all(r["n"] == 1 for r in rows)


def test_session_windows_batch_and_streaming(spark, tmp_path):
    """session_window merges events within the gap; session end = last
    event + gap; streaming mode emits closed sessions incrementally."""
    import datetime as dt

    from adfs_spark.streaming.loops import sessionized_event_counts

    T0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    schema = "ts timestamp, user_id long, value double"
    rows = [
        (T0, 1, 1.0),
        (T0 + dt.timedelta(minutes=10), 1, 2.0),   # merges with t0 (gap 30m)
        (T0 + dt.timedelta(minutes=50), 1, 4.0),   # new session
        (T0 + dt.timedelta(minutes=5), 2, 8.0),    # lone session
    ]
    batch = spark.createDataFrame(rows, schema)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in sessionized_event_counts(batch, gap="30 minutes").collect()
    }
    g = dt.timedelta(minutes=30)
    assert got[(1, T0, T0 + dt.timedelta(minutes=10) + g)] == (2, 3.0)
    assert got[(1, T0 + dt.timedelta(minutes=50), T0 + dt.timedelta(minutes=50) + g)] == (1, 4.0)
    assert got[(2, T0 + dt.timedelta(minutes=5), T0 + dt.timedelta(minutes=5) + g)] == (1, 8.0)

    src = str(tmp_path / "sess_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionized_event_counts(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # append mode emits only watermark-closed sessions; what is emitted
    # must be a subset of the batch answer
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions").collect()
    }
    for k, v in emitted.items():
        assert got[k] == v


def test_maintain_group_aggregate_stream(spark, tmp_path):
    """IVM: the per-group (sum, count) view tracks the source through
    inserts, updates, and group-emptying deletes — equal to a full
    recompute after every maintenance pass."""
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.streaming.loops import maintain_group_aggregate

    src_spec = TableSpec(
        "m_src",
        (ColumnSpec("k", "long"), ColumnSpec("grp", "string"), ColumnSpec("val", "double")),
        ("k",),
        versioned=True,
    )
    agg_spec = TableSpec(
        "m_agg",
        (ColumnSpec("grp", "string"), ColumnSpec("sum_val", "double"), ColumnSpec("n_rows", "long")),
        ("grp",),
        versioned=True,
    )
    source = VersionedTable(spark, src_spec, str(tmp_path / "m_src"))
    source.init(spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)],
        "k: long, grp: string, val: double",
    ))
    agg = VersionedTable(spark, agg_spec, str(tmp_path / "m_agg"))
    agg.init()

    def recompute():
        return {
            r["grp"]: (r["sum_val"], r["n_rows"])
            for r in source.live().groupBy("grp")
            .agg(F.sum("val").alias("sum_val"), F.count("*").alias("n_rows"))
            .collect()
        }

    def maintained():
        return {r["grp"]: (r["sum_val"], r["n_rows"]) for r in agg.live().collect()}

    ck = str(tmp_path / "m_ckpt")
    maintain_group_aggregate(source, agg, "grp", "val", ck).awaitTermination(120)
    assert maintained() == recompute() == {"a": (15.0, 2), "b": (7.0, 1)}

    # update k=2 into group b, insert a new group c, empty group b later
    source.upsert(spark.createDataFrame(
        [(2, "b", 6.0), (4, "c", 1.0)], "k: long, grp: string, val: double"
    ))
    maintain_group_aggregate(source, agg, "grp", "val", ck).awaitTermination(120)
    assert maintained() == recompute()

    source.delete_where(F.col("grp") == "b")
    maintain_group_aggregate(source, agg, "grp", "val", ck).awaitTermination(120)
    got = maintained()
    assert got == recompute() and "b" not in got


def test_interval_join_streams(spark, tmp_path):
    """Stream-stream time-bounded join: right rows within
    [left_ts, left_ts+10m] per user; streaming output equals the batch
    join on the same data."""
    import datetime as dt

    from adfs_spark.streaming.loops import interval_join_streams

    T0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    schema = "ts timestamp, user_id long, value double"
    errors = spark.createDataFrame(
        [(T0, 1, 0.0), (T0 + dt.timedelta(minutes=40), 1, 0.0), (T0, 2, 0.0)], schema
    )
    clicks = spark.createDataFrame(
        [
            (T0 + dt.timedelta(minutes=5), 1, 1.0),    # joins error@T0
            (T0 + dt.timedelta(minutes=45), 1, 2.0),   # joins error@T0+40 only
            (T0 + dt.timedelta(minutes=20), 2, 3.0),   # outside 10m of err@T0
            (T0 + dt.timedelta(minutes=9), 3, 4.0),    # no error for user 3
        ],
        schema,
    )
    batch = interval_join_streams(errors, clicks).select(
        "user_id", "ts", "ts_r", "value_r"
    )
    want = {tuple(r) for r in batch.collect()}
    assert {(r[0], r[3]) for r in want} == {(1, 1.0), (1, 2.0)}

    edir, cdir = str(tmp_path / "err"), str(tmp_path / "clk")
    errors.write.mode("overwrite").parquet(edir)
    clicks.write.mode("overwrite").parquet(cdir)
    es = spark.readStream.schema(errors.schema).parquet(edir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    q = (
        interval_join_streams(es, cs)
        .select("user_id", "ts", "ts_r", "value_r")
        .writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ij_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("select * from ij").collect()}
    assert got == want
