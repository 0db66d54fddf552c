"""Streaming loops — the reference's RPC/monitor threads re-expressed
as Structured Streaming.

The reference's "streams" are processing-time loops: heartbeat upserts
every ~3s (D6, updateDatanodeByDatanodeDescriptor :413-468), periodic
block reports diffed against state (D7, processReport :2468-2620), a
lease monitor scanning for expired holders (T1, LeaseMonitor :893-914),
and an async edit-log applier on replicas (D5, DistributedEditLogger
:41-170).  None of them have event-time semantics — so the faithful
mapping is file-source streams + ``foreachBatch`` appliers with
processing-time triggers.

On top, :func:`windowed_event_counts` adds what the reference lacks:
event-time tumbling windows with watermarks for late data — the
idiomatic-Spark extension (SURVEY §7 step 7).

Scale: every sink here is an idempotent merge by (pk, version) — D5's
at-least-once batch replay is safe; watermark state is bounded by
(window × keys), the classic streaming-state sizing.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from adfs_spark.storage import OP_COL, VBUCKET_COL, VersionedTable


def _event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce an event-time column to TIMESTAMP (LTZ) — Structured
    Streaming rejects TIMESTAMP_NTZ watermarks, and parquet fixtures
    written with the NTZ session default would otherwise fail at
    ``withWatermark``.  No-op for already-LTZ columns."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def changelog_stream(spark: SparkSession, table: VersionedTable) -> DataFrame:
    """D1 as a stream: follow a table's change log (file source tails
    the version-bucketed directory)."""
    schema = table.spec.struct_type().add(OP_COL, T.StringType())
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(table.changelog_path + f"/{VBUCKET_COL}=*")
    )


def replicate(
    source: VersionedTable,
    replica: VersionedTable,
    checkpoint: str,
) -> StreamingQuery:
    """D5: the edit-logger applier — tail the master's change log and
    idempotently merge each micro-batch into the replica (U4
    last-writer-wins makes at-least-once replay safe; barrier =
    ``processAllAvailable``, parity with waitUntilWorkSizeIsEmpty
    :163-170).

    PUBLISHED versions only: the file source reads raw changelog
    files, which may include rows a writer appended but has not yet
    made visible (its watermark bump — or its fence, if it crashed —
    comes later).  Applying those raw rows would let the replica
    permanently diverge on exactly the keys a fence later retracts.
    So the micro-batch content is used as a TRIGGER only; the rows
    actually applied come from ``source.delta(applied+1, vt)`` — the
    manifest-gated read that caps at the source's ``visible_through``
    and excludes every fenced range.  Rows above the watermark are
    thereby deferred to a later micro-batch (they apply once vt passes
    them), making the fence filter belt-and-suspenders rather than the
    only guard."""
    spark = source.spark
    state = {"applied": replica.max_version()}

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        vt = source.last_visible()
        if vt <= state["applied"]:
            return
        rows = source.delta(state["applied"] + 1, vt).drop(OP_COL)
        replica.apply_directly(rows)
        state["applied"] = vt

    return (
        changelog_stream(spark, source)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def heartbeat_applier(
    heartbeats: DataFrame,
    datanodes: VersionedTable,
    checkpoint: str,
) -> StreamingQuery:
    """D6: streaming heartbeat upserts — each micro-batch keeps the
    latest row per datanode id and upserts it."""

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        from adfs_spark.operators.aggregates import group_argmax

        latest = group_argmax(batch, list(datanodes.spec.primary_key), ["lastUpdated"])
        datanodes.upsert(latest)

    return (
        heartbeats.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def report_reconciler(
    reports: DataFrame,
    blocks: VersionedTable,
    out_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """D7: streaming block-report reconciliation — each micro-batch of
    reported replica rows (datanodeId, id, length, generationStamp) is
    classified against stored state with the J5 full-outer CASE
    (processReport :2468-2620) and the per-datanode verdicts
    (added/removed/corrupt/ok) append to ``out_path``.

    One report batch may carry several datanodes; the classification
    join is keyed (datanodeId, id), so the whole batch reconciles in a
    single shuffle regardless of how many nodes reported.  Idempotent:
    re-processing a batch appends the same verdicts (dedupe downstream
    by (epoch, datanodeId, id) if exactly-once is needed)."""

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        from adfs_spark.operators.joins import report_classify

        reporting = [
            r["datanodeId"] for r in batch.select("datanodeId").distinct().collect()
        ]  # bounded: one row per reporting datanode in this batch
        stored = blocks.live().filter(F.col("datanodeId").isin(reporting))
        out = report_classify(
            batch.select("datanodeId", "id", "length", "generationStamp"),
            stored.select("datanodeId", "id", "length", "generationStamp"),
            ["datanodeId", "id"],
            ["generationStamp", "length"],
        ).withColumn("_epoch", F.lit(epoch_id))
        out.write.mode("append").parquet(out_path)

    return (
        reports.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    slide: str | None = None,
) -> DataFrame:
    """Event-time window counts with a watermark for late data — the
    idiomatic extension the reference lacks (its loops are purely
    processing-time).  ``slide`` < ``window`` gives overlapping sliding
    windows (each event lands in window/slide of them); state is
    bounded by (keys × open windows) after watermark eviction.  Works
    on both batch and streaming DataFrames."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key: events within ``gap`` of each
    other merge into one session (session end = last event + gap).
    The native ``session_window`` keeps the merge inside the JVM state
    store — unlike the batch lag()-based sessionizer
    (``events_sessionize``), this form also runs incrementally on a
    stream, with per-session state evicted once the watermark passes a
    session's end.  Works on both batch and streaming DataFrames."""
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedupe_native(
    events: DataFrame,
    id_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event admission with bounded state, the built-in
    way: ``dropDuplicatesWithinWatermark`` keeps per-key state in the
    JVM state store and evicts it once the watermark passes — unlike a
    global ``dropDuplicates``, state is O(keys per watermark window),
    not O(stream history).  This is the native-operator tier of
    ``stateful.streaming_dedupe`` (which keeps custom per-key state in
    Python); prefer this one when "first occurrence wins within the
    late-data horizon" is the whole requirement.  Works on batch frames
    too (plain dropDuplicates semantics)."""
    ev = _event_time(events, ts_col)
    if not ev.isStreaming:
        return ev.dropDuplicates(list(id_cols))
    return ev.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def _has_prior_epochs(spark: SparkSession, d: str, before: int) -> bool:
    """True iff ``d`` holds an ``epoch=<e>`` partition with e < ``before``.
    Probed through the Hadoop FileSystem API so the state dir may live
    on any Hadoop-compatible FS (HDFS/S3) — everything else in the
    neardup loop already goes through Spark.  The ``before`` bound makes
    an epoch-0 retry (own partitions written, checkpoint not committed)
    correctly take the first-batch branch."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(d)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("epoch="):
            try:
                if int(name.split("=", 1)[1]) < before:
                    return True
            except ValueError:
                continue
    return False


def _neardup_apply_batch(
    spark: SparkSession,
    state_dir: str,
    docs: DataFrame,
    epoch_id: int,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    num_bands: int,
    threshold: float,
) -> None:
    """One :func:`neardup_stream` micro-batch — module-level so replay
    (an at-least-once retry of the SAME epoch after its partitions were
    already written) is directly testable.  Corpus/index reads exclude
    ``epoch >= epoch_id``: a crash between the corpus write and the
    checkpoint commit must not feed the batch's own docs back as corpus
    (minhash_dedup_incremental requires disjoint batch/corpus ids)."""
    import os

    from adfs_spark.functions.dedup import (
        minhash_dedup_incremental,
        minhash_index,
        minhash_near_duplicates,
    )

    pairs_dir = os.path.join(state_dir, "pairs")
    index_dir = os.path.join(state_dir, "index")
    corpus_dir = os.path.join(state_dir, "corpus")
    persisted: list[DataFrame] = []
    if _has_prior_epochs(spark, corpus_dir, epoch_id):
        corpus = (
            spark.read.parquet(corpus_dir)
            .filter(F.col("epoch") < epoch_id)
            .drop("epoch")
        )
        idx = (
            spark.read.parquet(index_dir)
            .filter(F.col("epoch") < epoch_id)
            .drop("epoch")
        )
        pairs = minhash_dedup_incremental(
            docs, corpus, idx, id_col, text_col,
            n, num_hashes, num_bands, threshold,
            persisted_out=persisted,
        )
    else:
        pairs = minhash_near_duplicates(
            docs, id_col, text_col, n, num_hashes, num_bands,
            threshold, collapse_exact=False, persisted_out=persisted,
        )
    try:
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"epoch={epoch_id}")
        )
    finally:
        # a long-running stream would otherwise accumulate cached
        # candidate/shingle blocks across micro-batches forever
        for p in persisted:
            p.unpersist()
    minhash_index(docs, id_col, text_col, n, num_hashes, num_bands).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, f"epoch={epoch_id}"))
    docs.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, f"epoch={epoch_id}")
    )


def neardup_stream(
    stream_docs: DataFrame,
    spark: SparkSession,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
) -> StreamingQuery:
    """Streaming near-dup dedup with a GROWING corpus index — the
    ingest-pipeline shape of MinHash+LSH: every micro-batch dedups
    against everything seen so far via the materialized
    ``minhash_index`` (only the batch is shingled/hashed; corpus text
    is re-read candidate-bounded), emits its near-dup pairs, then
    appends its own banded rows to the index and its docs to the
    corpus.

    Exactly-once under replay: each epoch writes its three outputs
    (pairs / index rows / docs) to ``epoch=<id>`` subdirectories with
    overwrite, so an at-least-once foreachBatch retry rewrites the
    same partition instead of duplicating it.  On a retry the corpus /
    index reads EXCLUDE the in-flight epoch's own partitions
    (``epoch < epoch_id``): a crash between the corpus write and the
    checkpoint commit would otherwise re-run the batch against a
    corpus already containing its docs, violating the batch/corpus id
    disjointness precondition of ``minhash_dedup_incremental``.

    Accumulated pairs across epochs = the batch pipeline's pairs over
    the full corpus (each pair is emitted exactly once, by the epoch
    that completes it) — pinned by
    test_neardup_stream_accumulates_batch_result.
    """
    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        docs = batch.select(id_col, text_col).localCheckpoint(eager=True)
        if docs.rdd.isEmpty():
            return
        _neardup_apply_batch(
            spark, state_dir, docs, epoch_id, id_col, text_col,
            n, num_hashes, num_bands, threshold,
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def events_file_stream(
    spark: SparkSession, events_dir: str, schema: T.StructType
) -> DataFrame:
    """Replay an events directory as a stream (test/bench harness for
    the D6/D7 loops)."""
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(events_dir)
    )


def maintain_group_aggregate(
    source: VersionedTable,
    agg: VersionedTable,
    group_col: str,
    value_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Incremental view maintenance of a per-group (sum, count)
    aggregate over a versioned table — the D-family extension that
    keeps derived views fresh without full recomputes.

    Each changelog micro-batch names the *affected groups*; only those
    groups are recomputed from the live snapshot (semi-join prune on
    the group key, which the storage layout clusters) and LWW-merged
    into the aggregate table.  Groups whose last live row disappeared
    are tombstoned.  Work per batch is O(rows of affected groups) —
    independent of table size — and at-least-once replay is safe
    because the per-group recompute is idempotent.

    The aggregate table's spec must be (group_col pk, sum_{value_col}
    double, n_rows long).
    """
    spark = source.spark

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        # Affected groups = every group the batch's pks were EVER in,
        # not just the batch rows' current group: a row moving from
        # group a to b changes both aggregates, and the new-image row
        # only names b.  The old memberships live in the changelog
        # history of those pks (per-pk history is bounded by compaction).
        pks = list(source.spec.primary_key)
        touched = batch.select(*pks).distinct()
        history = source.changelog().join(F.broadcast(touched), pks, "left_semi")
        groups = (
            batch.select(F.col(group_col))
            .union(history.select(F.col(group_col)))
            .distinct()
        )
        live = source.live()
        fresh = (
            live.join(F.broadcast(groups), group_col, "left_semi")
            .groupBy(group_col)
            .agg(
                F.sum(value_col).alias(f"sum_{value_col}"),
                F.count("*").alias("n_rows"),
            )
        )
        gone = groups.join(fresh, group_col, "left_anti")
        if fresh.take(1):
            agg.upsert(fresh, overwrite=True)
        if gone.take(1):
            agg.delete_where_keys(gone)

    return (
        changelog_stream(spark, source)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right events within
    [left_ts, left_ts + upper] per key — the streaming twin of the
    batch range/as-of join family (operators/joins.range_join).

    Both sides carry watermarks and the join condition is time-bounded,
    so the state store evicts rows once the watermark passes their
    join-window upper bound: state is O(keys × window), not O(stream).
    Right-side columns come back suffixed ``_r``.  Works on batch
    DataFrames too (same plan, no state).

    ``how='leftOuter'`` emits unmatched left rows with NULL right
    columns — on a stream these surface only once the watermark passes
    the row's join window (the engine must prove no match can still
    arrive), the standard outer-join latency trade.
    """
    lw = _event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = _event_time(right, right_ts).withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"{c}_r") for c in rw.columns])
    cond = (
        (F.col(key_col) == F.col(f"{key_col}_r"))
        & (F.col(f"{right_ts}_r") >= F.col(left_ts))
        & (F.col(f"{right_ts}_r") <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
