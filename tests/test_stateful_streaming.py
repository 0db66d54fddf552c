from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.streaming.stateful import liveness_monitor, streaming_dedupe


def test_streaming_dedupe(spark, tmp_path):
    # two batches with overlapping keys
    b1 = spark.createDataFrame([(1, 10.0), (1, 11.0), (2, 20.0)], "user_id: long, value: double")
    b2 = spark.createDataFrame([(1, 12.0), (3, 30.0)], "user_id: long, value: double")
    src = str(tmp_path / "src")
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_dedupe(stream, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from dedup_out").collect()
    keys = sorted(r["key"] for r in rows)
    assert keys == [1, 2, 3]  # each key exactly once across batches


def test_liveness_monitor(spark, tmp_path):
    hb = spark.createDataFrame(
        [(7, 1000), (7, 2000), (8, 1500)], "key: long, hb_ms: long"
    )
    src = str(tmp_path / "hb")
    hb.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("key long, hb_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = liveness_monitor(stream, timeout_ms=30_000, emit_dead=False)
    q = (
        out.writeStream.format("memory")
        .queryName("live_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["key"]: r["status"] for r in spark.sql("select * from live_out").collect()}
    assert rows == {7: "ALIVE", 8: "ALIVE"}


class _FakeState:
    """Minimal GroupState stand-in for driving the transition function."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_liveness_transitions_unit():
    """ALIVE→DEAD→recovery ALIVE through the transition function —
    deterministic (no wall-clock timeouts)."""
    import pandas as pd

    from adfs_spark.streaming.stateful import make_liveness_fn

    fn = make_liveness_fn(timeout_ms=30_000)
    st = _FakeState()
    # first heartbeat → ALIVE, timeout armed
    out = list(fn((7,), [pd.DataFrame({"hb_ms": [1000]})], st))
    assert out[0].iloc[0]["status"] == "ALIVE" and st.get == (1000, True)
    assert st.timeout_set == 30_000
    # heartbeat within window → no emission
    assert list(fn((7,), [pd.DataFrame({"hb_ms": [2000]})], st)) == []
    # timeout fires → DEAD with the last heartbeat ts
    st.hasTimedOut = True
    out = list(fn((7,), [], st))
    assert out[0].iloc[0]["status"] == "DEAD"
    assert out[0].iloc[0]["last_heartbeat_ms"] == 2000 and st.get == (2000, False)
    # second timeout with no new data → nothing (DEAD emitted once)
    assert list(fn((7,), [], st)) == []
    # heartbeat after DEAD → recovery ALIVE
    st.hasTimedOut = False
    out = list(fn((7,), [pd.DataFrame({"hb_ms": [99000]})], st))
    assert out[0].iloc[0]["status"] == "ALIVE" and st.get == (99000, True)


def test_streaming_dedupe_native(spark, tmp_path):
    import pyspark.sql.functions as F

    from adfs_spark.streaming.loops import streaming_dedupe_native

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    # duplicate event ids across two files (redelivery within watermark)
    a = spark.createDataFrame(
        [(1, "2026-01-01 00:00:01", 1.0), (2, "2026-01-01 00:00:02", 2.0)],
        "event_id: long, ts_s: string, value: double",
    ).withColumn("ts", F.to_timestamp_ntz("ts_s")).drop("ts_s")
    b = spark.createDataFrame(
        [(2, "2026-01-01 00:00:02", 2.0), (3, "2026-01-01 00:00:03", 3.0)],
        "event_id: long, ts_s: string, value: double",
    ).withColumn("ts", F.to_timestamp_ntz("ts_s")).drop("ts_s")
    a.write.mode("append").parquet(src)
    b.write.mode("append").parquet(src)

    stream = spark.readStream.schema(a.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_dedupe_native(stream, ["event_id"], watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedupe_native")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.sql("select event_id from dedupe_native").collect())
    assert got == [1, 2, 3]

    # batch fallback
    assert streaming_dedupe_native(a.unionAll(b), ["event_id"]).count() == 3


def test_interval_join_left_outer(spark, tmp_path):
    import pyspark.sql.functions as F

    from adfs_spark.streaming.loops import interval_join_streams

    def frame(rows):
        return spark.createDataFrame(
            rows, "user_id: long, ts_s: string, event_id: long"
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    # left user 1 matches; left user 2 has no right row at all
    left = frame([(1, "2026-01-01 00:10:00", 100), (2, "2026-01-01 00:11:00", 200)])
    right = frame([(1, "2026-01-01 00:12:00", 900)])
    # batch form: outer semantics immediately
    got = interval_join_streams(left, right, upper="5 minutes", how="leftOuter").collect()
    by_id = {r["event_id"]: r for r in got}
    assert set(by_id) == {100, 200}
    assert by_id[100]["event_id_r"] == 900
    assert by_id[200]["event_id_r"] is None

    # streaming form: a far-future sentinel on both sides pushes the
    # watermark past user 2's join window so the unmatched row emits
    sentinel_l = frame([(99, "2026-01-01 06:00:00", 1)])
    sentinel_r = frame([(99, "2026-01-01 06:00:00", 2)])
    ldir, rdir, ck = str(tmp_path / "l"), str(tmp_path / "r"), str(tmp_path / "ck")
    left.write.parquet(ldir); sentinel_l.write.mode("append").parquet(ldir)
    right.write.parquet(rdir); sentinel_r.write.mode("append").parquet(rdir)
    ls = spark.readStream.schema(left.schema).parquet(ldir)
    rs = spark.readStream.schema(right.schema).parquet(rdir)
    q = (
        interval_join_streams(ls, rs, upper="5 minutes", watermark="10 minutes", how="leftOuter")
        .writeStream.format("memory").queryName("ivjlo").outputMode("append")
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = {r["event_id"]: r for r in spark.sql("select * from ivjlo").collect()}
    assert rows[100]["event_id_r"] == 900
    assert 200 in rows and rows[200]["event_id_r"] is None


def test_neardup_stream_accumulates_batch_result(spark, tmp_path):
    """Three ingest waves through neardup_stream: the accumulated
    pairs must equal the BATCH MinHash pipeline over the full corpus —
    each pair found exactly once, by the epoch that completes it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from adfs_spark.functions.dedup import minhash_near_duplicates
    from adfs_spark.streaming.loops import neardup_stream

    base = "the quick brown fox jumps over the lazy dog " * 6
    waves = [
        [(1, base + "alpha beta gamma"), (2, "unrelated content " * 12)],
        [(11, base + "alpha beta gamma delta"),          # pairs with 1
         (12, "unrelated content " * 12 + "tail bit")],  # pairs with 2
        [(21, base + "alpha beta gamma epsilon")],       # pairs with 1 and 11
    ]
    src = tmp_path / "waves"
    src.mkdir()
    for i, wave in enumerate(waves):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in wave], pa.int64()),
                    "text": pa.array([t for _, t in wave], pa.string()),
                }
            ),
            str(src / f"wave{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sq = neardup_stream(
        stream, spark, str(tmp_path / "state"), str(tmp_path / "ckpt"),
        num_hashes=32, num_bands=8, threshold=0.7,
    )
    sq.awaitTermination()

    got_df = spark.read.parquet(str(tmp_path / "state" / "pairs"))
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in got_df.collect()}

    all_docs = spark.createDataFrame(
        [d for wave in waves for d in wave], "doc_id: long, text: string"
    )
    full = minhash_near_duplicates(
        all_docs, "doc_id", "text", num_hashes=32, num_bands=8,
        threshold=0.7, collapse_exact=False,
    ).collect()
    expected = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in full}
    assert got == expected
    # sanity: the fixture exercises cross-epoch pairs in both
    # directions (epoch 1 vs 0, epoch 2 vs 0 AND vs 1) — doc 2/12's
    # two-token boilerplate has too few distinct shingles to qualify
    # (jaccard 0.4), in stream and batch alike
    pair_ids = {(a, b) for a, b, _ in got}
    assert {(1, 11), (1, 21), (11, 21)} <= pair_ids


def test_neardup_batch_replay_is_exactly_once(spark, tmp_path):
    """At-least-once retry of the SAME epoch after its corpus/index/docs
    partitions were already written (crash between the corpus write and
    the checkpoint commit): the replayed epoch must exclude its own
    orphaned partitions from the corpus read — otherwise batch and
    corpus ids overlap, shingle counts double, and exact-dup pairs get
    a corrupted jaccard (regression test for the epoch < epoch_id
    visibility filter)."""
    from adfs_spark.streaming.loops import _neardup_apply_batch

    base = "the quick brown fox jumps over the lazy dog " * 6
    state = str(tmp_path / "state")
    kw = dict(
        id_col="doc_id", text_col="text", n=3,
        num_hashes=32, num_bands=8, threshold=0.7,
    )
    wave0 = spark.createDataFrame(
        [(1, base + "alpha beta gamma")], "doc_id: long, text: string"
    )
    _neardup_apply_batch(spark, state, wave0, 0, **kw)
    wave1 = spark.createDataFrame(
        [(11, base + "alpha beta gamma delta"),
         (12, base + "alpha beta gamma delta")],  # exact dup of 11
        "doc_id: long, text: string",
    )
    _neardup_apply_batch(spark, state, wave1, 1, **kw)
    first = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in spark.read.parquet(state + "/pairs/epoch=1").collect()
    }
    # the exact-dup pair must be present at jaccard 1.0
    assert (11, 12, 1.0) in first
    assert {(a, b) for a, b, _ in first} == {(1, 11), (1, 12), (11, 12)}
    # replay epoch 1 (its own epoch=1 partitions now exist on disk)
    _neardup_apply_batch(spark, state, wave1, 1, **kw)
    second = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in spark.read.parquet(state + "/pairs/epoch=1").collect()
    }
    assert second == first
    # an epoch-0 retry must take the first-batch branch, not see itself
    _neardup_apply_batch(spark, state, wave0, 0, **kw)
    assert spark.read.parquet(state + "/pairs/epoch=0").count() == 0
