"""Versioned table storage — upsert / masked update / tombstone / delta.

Re-expresses the reference's write path (U1-U5) and CDC/replication
surface (D1-D3) on plain parquet:

- every row carries a ``version`` long; ``abs(version)`` is unique and
  monotonically increasing per table (DistributedDataVersion.java:26-51);
- deletes are tombstones: the row is kept with negated version
  (deleteInternal, DistributedDataRepositoryBaseOnTable.java:316-330);
- the live view strips ``version < 0`` (removeDeletedRows :481-488);
- every write also appends to a **change log** directory (the
  DistributedOperationQueue D1 analog, DistributedOperationQueue.java:21-103),
  partitioned by a version bucket so version-range delta extraction
  (D2, getDataIncrement :221-249) prunes partitions instead of scanning
  history.

Concurrency stance: the reference serializes writers with a per-key
lock manager (U6, DistributedLocker.java:103-160) because many RPC
threads mutate one MySQL instance.  Here concurrent *jobs* are
serialized by an optimistic commit sequence (``_commits/`` sidecar,
atomic put-if-absent reservation — see the commit-sequence section
below): the loser retries against the winner's state, versions never
overlap.  Replication (D3/D4) is subsumed by the shared, durable file
system, so "full restore" is a parquet copy and "incremental restore"
is a delta read + idempotent merge.

Scale notes: with ``num_buckets > 0`` the current state is
hash-partitioned on the primary key and every write is an incremental
MERGE — read only the touched buckets (partition pruning), rewrite only
those partitions (dynamic partition overwrite).  A 1-row upsert then
costs O(table/num_buckets), which is the 100 TB write path; size
buckets so one bucket ≈ a few hundred MB.  The unbucketed path
(full tmp-swap rewrite) remains for small dimension tables.  For
high-churn workloads, append to the changelog only and ``compact``
periodically.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adfs_spark.backend import CommitBackend, LocalCommitBackend, backend_from_env
from adfs_spark.functions import xxh
from adfs_spark.schema import VERSION_COL, TableSpec

OP_COL = "_op"  # INSERT / UPDATE / DELETE, DistributedOperation op types
VBUCKET_COL = "_vbucket"
VBUCKET_SIZE = 1_000_000
KBUCKET_COL = "_kb"  # pk-hash bucket (partition column of current/)
VSTAMP_BUCKETS = 64  # parallelism of version stamping (see _stamp_versions)
# Max estimated batch size the distributed write tail will persist for
# the duration of one op (the batch is read ~3x: stamp counts,
# changelog append, merge).  Batches past the gate — bulk loads,
# restores — recompute instead of spooling themselves to local disk.
WRITE_BATCH_PERSIST_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_WRITE_PERSIST_MAX", str(4 << 30))
)

COMMITS_DIR = "_commits"
LOCK_TTL_SEC = 600.0  # a .lock older than this is a crashed writer's lease
_MAX_COMMIT_RETRIES = 50

OVERLAY_META = "_overlay.json"
"""Per-table visibility metadata (written atomically via tmp+rename):

- ``compacted_through`` (ct): every visible op with abs(version) <= ct
  is folded into ``current/``.
- ``visible_through`` (vt): committed ops end here.  Changelog rows in
  (ct, vt] are the PENDING OVERLAY — written by the changelog-append
  fast path and merged into reads on the fly (:meth:`VersionedTable.
  snapshot`); a merge write or :meth:`~VersionedTable.compact` folds
  them down and advances ct to vt.
- ``aborted``: [lo, hi] abs-version ranges fenced off after a writer
  crashed between its changelog append and its visibility bump; rows
  in these ranges exist physically in the changelog but are excluded
  from every read (snapshot overlay, delta, time travel) forever.

Tables created before this metadata existed (no ``_overlay.json``)
read exactly as before: everything in ``current/`` + nothing pending.
"""


class WriteConflictError(RuntimeError):
    """A concurrent writer held the table's commit sequence for longer
    than the retry budget."""


def _latest_by_abs_version(
    df: DataFrame, pk: Sequence[str], cluster: tuple[str, int] | None = None
) -> DataFrame:
    """Last-writer-wins by abs(version) per primary key (U4 semantics,
    insert/update/deleteDirectly :420-470).

    ``cluster=(col, n)`` (r9): hash-partition the input by ``col`` — a
    pure function of the pk, e.g. the bucket column — into ``n``
    partitions FIRST and key the window by (col, *pk).  The result is
    identical (same-pk rows share the same ``col`` value), but the
    window's clustering requirement is satisfied by the explicit
    exchange (hash partitioning on a subset of the window keys already
    co-locates every (col, pk) group), so the plan carries ONE exchange
    that both merges versions and clusters the output for the bucketed
    write (guide §2.4: operations keyed the same way share one
    exchange)."""
    keys: list[str] = list(pk)
    if cluster is not None:
        ccol, n = cluster
        df = df.repartition(n, F.col(ccol))
        keys = [ccol, *keys]
    w = Window.partitionBy(*keys).orderBy(F.abs(F.col(VERSION_COL)).desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _stamp_versions(
    rows: DataFrame, pk: Sequence[str], base: int, negate: bool = False
) -> DataFrame:
    return _stamp_versions_n(rows, pk, base, negate)[0]


def _stamp_versions_n(
    rows: DataFrame, pk: Sequence[str], base: int, negate: bool = False
) -> tuple[DataFrame, int]:
    """Stamp each row with a dense unique version in (base, base+n] —
    **in parallel** (two-pass partition-offset numbering).

    A global ``row_number().over(Window.orderBy(pk))`` funnels the
    whole batch through one task; the reference's DistributedDataVersion
    is just an AtomicLong (DistributedDataVersion.java:26-51), so dense
    numbering without a global sort is enough.  Pass 1 hashes rows into
    ``VSTAMP_BUCKETS`` deterministic pk-hash buckets and collects the
    per-bucket *counts* (≤64 longs — metadata, not data) to compute
    cumulative offsets; pass 2 numbers rows within each bucket::

        version = base + offset[bucket] + row_number_within_bucket

    The stamping plan contains only a hash-partitioned Exchange — no
    single-partition funnel — and, because bucket assignment is a pure
    function of the key, versions are deterministic under recomputation
    (the same stamped frame feeds both the changelog append and the
    current-state merge).

    Returns ``(stamped, n)`` — n = total rows stamped (the batch's new
    visibility watermark is ``base + n``), already known from the
    pass-1 counts, so append-path writers never run an extra count job.
    """
    pk_concat = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in pk])
    bucket = F.pmod(F.xxhash64(pk_concat), F.lit(VSTAMP_BUCKETS)).cast("int")
    tagged = rows.withColumn("_vsb", bucket)
    counts = {r["_vsb"]: r["count"] for r in tagged.groupBy("_vsb").count().collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        off = F.create_map(
            *[F.lit(x) for b_off in offsets.items() for x in b_off]
        )[F.col("_vsb")]
    else:
        off = F.lit(0)
    w = Window.partitionBy("_vsb").orderBy(*pk)
    v = (F.lit(base) + off + F.row_number().over(w)).cast("long")
    if negate:
        v = -v
    return tagged.withColumn(VERSION_COL, v).drop("_vsb"), acc


@dataclass
class VersionedTable:
    """A parquet-backed table with version/tombstone semantics.

    Layout::

        <root>/current/           current state (one row per pk, incl. tombstones)
        <root>/changelog/         append-only ops, partitioned by _vbucket
    """

    spark: SparkSession
    spec: TableSpec
    root: str
    partition_by: tuple[str, ...] = ()
    num_buckets: int = 0
    """When > 0, current/ is hash-partitioned into ``num_buckets``
    directories on a deterministic pk hash.  Writes then become
    **incremental merges**: only the buckets containing touched keys
    are read and rewritten (partition pruning on read, dynamic
    partition overwrite on write).  This is the 100 TB write path — a
    1-row upsert rewrites 1/num_buckets of the table, not all of it."""

    bucket_by: tuple[str, ...] = ()
    """When set, ``current/`` is maintained as a Spark SQL *bucketed*
    table (``CLUSTERED BY (bucket_by) SORTED BY (bucket_by) INTO
    bucket_count BUCKETS``) registered in the session catalog.  Every
    scan then carries the bucket metadata, so joins and aggregations on
    the bucket key are **exchange-free** (plan-gated by
    tests/test_plans.py) — at 100 TB this turns every repeated
    fact⋈fact join on the key from a full network shuffle into a local
    merge, the same physics the reference gets from its (id,
    datanodeId) clustered PK (Block.java:33-36).  Mutually exclusive
    with ``num_buckets``/``partition_by``: Spark bucketed tables are
    whole-table rewrites, so small writes should ride the
    changelog-append tier (``mode='auto'`` already routes them there)
    and merges/compacts pay the rewrite that keeps the layout.
    ``compact()`` preserves bucketing (it funnels through
    ``_write_current``)."""

    bucket_count: int = 32
    """Bucket fan-out for ``bucket_by`` tables.  Both sides of a join
    must use the same count for the exchange-free plan."""

    append_threshold: int = 100_000
    """``mode='auto'`` write routing: batches at or below this many
    rows take the changelog-append fast path (no bucket rewrite —
    the reference's B-tree point-update analog, FileRepository.
    updateInternal :226-286); larger batches amortize the merge floor
    and fold immediately.  The bound keeps the pending overlay
    broadcast-joinable on reads (overlay keys ≈ a few MB)."""

    txn: "TransactionLog | None" = None
    """Set by :meth:`TransactionLog.enroll`.  Enrolled tables commit
    through the SHARED transaction log: visibility (vt + fences) lives
    in its manifest instead of the local ``_overlay.json`` (which keeps
    only the physical fold state ct), every mutation takes the
    changelog-append path (a fold inside an uncommitted transaction
    would leak rows into current/), and serialization happens on the
    txn's single lock — the engine's analog of the one FSNamesystem
    lock under which the reference commits a multi-table op batch
    (DistributedOperationQueue.getOperations :82-103,
    FSNamesystem.startFileInternal :842-870)."""

    backend: CommitBackend = field(default_factory=backend_from_env)
    """Commit-plane storage (locks, commit manifests, overlay
    watermarks).  Every durability primitive routes through the SIX
    verbs of :class:`~adfs_spark.backend.CommitBackend` — swap in an
    object-store implementation (conditional PUT + atomic object
    create) and the protocol carries over unchanged; the
    MemoryCommitBackend fake runs the same protocol tests to prove the
    verb set is sufficient.  Data-plane I/O (parquet buckets, changelog
    files) stays with Spark."""

    mor_tail_fraction: float = 0.05
    """Merge-on-read routing bound for ``mode='auto'`` writes larger
    than ``append_threshold``: a spread update (e.g. 1% of keys, every
    pk bucket touched) makes the merge O(table) — the classic
    write-amplification wall of copy-on-write parquet.  When the batch
    would keep the pending changelog tail within
    ``max(append_threshold · overlay_fold_factor, mor_tail_fraction ·
    rows-folded-so-far)``, auto routes it to a *distributed append*
    instead: O(batch) changelog write, reads shuffle-merge the overlay
    (a ≤5% tax by construction), and ``compact()`` amortizes the fold.
    This is the Hudi/Delta merge-on-read trade, bounded so the read tax
    can't grow unbounded; the folded-rows watermark (``ct``) stands in
    for the table's row count (one metadata read, no counting job)."""

    overlay_fold_factor: int = 4
    """Read-amplification bound on the pending overlay: when the
    unfolded changelog tail exceeds ``append_threshold *
    overlay_fold_factor`` versions, the next append-routed write folds
    instead (and :meth:`snapshot` drops the broadcast hint in favor of
    a shuffle merge as a second guard) — otherwise a long append streak
    grows the overlay key broadcast without bound and eventually OOMs
    the driver on every read.  Enrolled tables never self-fold (a fold
    inside an uncommitted transaction leaks); they rely on the shuffle
    fallback plus a periodic :meth:`compact`."""

    def __post_init__(self) -> None:
        if self.bucket_by and (self.num_buckets or self.partition_by):
            raise ValueError(
                "bucket_by (Spark bucketed layout) is mutually exclusive "
                "with num_buckets/partition_by (pk-hash directory layout)"
            )
        # cached current/ DataFrame HANDLE (plan + file index), r10:
        # see _read_current_raw.  Metadata only — no rows are memoized.
        self._current_df = None

    def _cast_spec(self, df: DataFrame) -> DataFrame:
        """Project onto the spec's columns WITH the spec's exact types.
        Every write funnels through this so the changelog stays
        type-uniform across files — an un-cast literal assignment (e.g.
        ``F.lit(106)`` into a long column) would otherwise write an
        int32 parquet file into a long column's history and break every
        later changelog read (delta / time travel / overlay)."""
        st = self.spec.struct_type()
        return df.select([F.col(f.name).cast(f.dataType) for f in st.fields])

    def _kbucket(self) -> Column:
        pk_concat = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in self.spec.primary_key])
        return F.pmod(F.xxhash64(pk_concat), F.lit(self.num_buckets)).cast("int")

    @property
    def current_path(self) -> str:
        return os.path.join(self.root, "current")

    @property
    def changelog_path(self) -> str:
        return os.path.join(self.root, "changelog")

    # -- bootstrap ---------------------------------------------------------

    def init(self, rows: DataFrame | None = None, start_version: int = 1) -> None:
        """Create the table, optionally seeding initial rows (stamped
        with consecutive versions starting at ``start_version``)."""
        def body() -> None:
            schema = self.spec.struct_type()
            if rows is None:
                df = self.spark.createDataFrame([], schema)
            else:
                df = _stamp_versions(rows, list(self.spec.primary_key), start_version - 1)
            # the stamped seed is read twice (current write + changelog
            # history); persist it for the op under the same size gate
            # as _write_op so the source scan + stamping compute once
            cached = None
            try:
                est = int(
                    df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                )
            except Exception:
                est = 1 << 62
            if rows is not None and est <= WRITE_BATCH_PERSIST_MAX_BYTES:
                from pyspark import StorageLevel

                cached = df.persist(StorageLevel.MEMORY_AND_DISK)
                df = cached
            try:
                if self.num_buckets:
                    # seed rows are external by contract (the table does
                    # not exist yet), so the anti-overwrite-while-reading
                    # tmp-swap is skipped — one write instead of two
                    self._write_partitions(
                        df.withColumn(KBUCKET_COL, self._kbucket()),
                        source_external=True,
                    )
                else:
                    self._write_current(df)
                ops = df.withColumn(OP_COL, F.lit("INSERT"))
                self._append_changelog(ops)
                self._mark_compacted()
            finally:
                if cached is not None:
                    cached.unpersist()

        self._transact(body, "INIT")

    # -- reads -------------------------------------------------------------

    def _full_schema(self) -> T.StructType:
        schema = self.spec.struct_type()
        if self.num_buckets:
            schema = schema.add(KBUCKET_COL, T.IntegerType())
        return schema

    def _read_current_raw(self) -> DataFrame:
        """Current state incl. the bucket partition column (if any).
        ``bucket_by`` tables read through the session catalog so the
        scan carries the bucket-co-location metadata a bare
        ``read.parquet`` would drop."""
        if self.bucket_by:
            name = self._bucket_table_name
            if not self.spark.catalog.tableExists(name):
                self._register_bucket_table()
            return self.spark.table(name)
        # r10: reuse the DataFrame handle across ops — a fresh
        # read.schema(...).parquet(...) re-resolves the DataSource and
        # re-lists current/ on EVERY op (~60-90 ms of the ~150 ms
        # namespace-op floor; rename/openClose/getFileStatus pay it per
        # call).  The handle caches the plan + file index only; every
        # action still scans the parquet files.  Freshness: the handle
        # is keyed on a stat token of current/ and its immediate
        # children (any rewrite — swap, dynamic overwrite, vacuum —
        # creates/removes entries there, bumping an mtime; ~64 stat
        # syscalls ≈ 0.1 ms), so writers in OTHER processes are picked
        # up too; in-process rewrites additionally invalidate
        # explicitly.  (The bucket_by branch above already gets exactly
        # this handle reuse from the session catalog.)
        tok = self._current_token()
        if self._current_df is None or self._current_df[0] != tok or tok is None:
            df = self.spark.read.schema(self._full_schema()).parquet(
                self.current_path
            )
            if tok is None:
                return df
            self._current_df = (tok, df)
        return self._current_df[1]

    def _current_token(self) -> "tuple | None":
        try:
            st = os.stat(self.current_path)
            tok = [("", st.st_mtime_ns)]
            with os.scandir(self.current_path) as it:
                for e in it:
                    tok.append((e.name, e.stat().st_mtime_ns))
            tok.sort()
            return tuple(tok)
        except OSError:
            return None

    def _invalidate_current(self) -> None:
        """Drop the cached current/ handle — call after ANY in-process
        rewrite of current/ (its file index holds the old file list).
        Cross-process rewrites are caught by the stat token above."""
        self._current_df = None

    @property
    def _bucket_table_name(self) -> str:
        """Deterministic catalog name for the bucketed current/ surface
        (root-scoped so two tables with the same spec don't collide)."""
        import hashlib

        h = hashlib.md5(os.path.abspath(self.root).encode()).hexdigest()[:12]
        return f"vt_bkt_{self.spec.name}_{h}"

    def _register_bucket_table(self) -> None:
        """(Re-)register the external bucketed table over current/ —
        a fresh SparkSession sees the files but not the catalog entry;
        the DDL re-attaches the bucket spec to the existing layout."""
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in self._full_schema().fields
        )
        keys = ", ".join(f"`{c}`" for c in self.bucket_by)
        self.spark.sql(
            f"CREATE TABLE {self._bucket_table_name} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
            f"INTO {self.bucket_count} BUCKETS "
            f"LOCATION '{os.path.abspath(self.current_path)}'"
        )

    # -- visibility metadata (overlay / fencing) ---------------------------

    @property
    def overlay_meta_path(self) -> str:
        return os.path.join(self.root, OVERLAY_META)

    def _local_overlay_meta(self) -> dict | None:
        raw = self.backend.read(self.overlay_meta_path)
        if raw is None:
            return None
        try:
            return json.loads(raw)
        except ValueError:
            return None

    def _overlay_meta(self) -> dict | None:
        """Effective visibility metadata.  Standalone tables: the local
        ``_overlay.json``.  Enrolled tables: ct from the local file
        (physical fold state), vt from the transaction log's manifest —
        the single source that flips atomically across tables — and
        aborted = the UNION of manifest fences and any fences recorded
        in the local file (e.g. from a crash while the table was still
        standalone, pre-enrollment — fences are permanent, so the union
        is always safe); inside an open transaction the writer's own
        staged watermark is merged in (read-your-own-writes)."""
        local = self._local_overlay_meta()
        if self.txn is None:
            return local
        m = self.txn.table_meta(self.spec.name)
        if local is None and m is None:
            return None
        ct = int(local["compacted_through"]) if local else 0
        local_ab = [list(r) for r in (local or {}).get("aborted", [])]
        if m is not None:
            vt = int(m.get("visible_through", 0))
            aborted = [list(r) for r in m.get("aborted", [])]
            for r in local_ab:
                if r not in aborted:
                    aborted.append(r)
        else:
            vt = int(local.get("visible_through", ct)) if local else ct
            aborted = local_ab
        return {
            "compacted_through": ct,
            "visible_through": max(vt, ct),
            "aborted": aborted,
        }

    def _write_overlay_meta(self, meta: dict) -> None:
        self.backend.replace(
            self.overlay_meta_path, json.dumps(meta).encode()
        )

    def _current_stats_max(self) -> int:
        """max abs(version) present in current/ — min/max on the raw
        column so parquet footer stats answer it without a data scan."""
        try:
            row = self._read_current_raw().agg(
                F.max(VERSION_COL), F.min(VERSION_COL)
            ).first()
        except Exception:
            return 0
        return max(int(row[0] or 0), -int(row[1] or 0), 0)

    def _changelog_phys_max(self, above_bucket: int) -> int:
        """max abs(version) physically present in the changelog tail
        (vbucket >= above_bucket) — includes orphaned rows a crashed
        writer appended but never made visible.  Footer stats only."""
        try:
            row = (
                self.changelog()
                .filter(F.col(VBUCKET_COL) >= above_bucket)
                .agg(F.max(VERSION_COL), F.min(VERSION_COL))
                .first()
            )
        except Exception:
            return 0
        return max(int(row[0] or 0), -int(row[1] or 0), 0)

    def _visible_cond(self) -> Column | None:
        """Changelog visibility filter: committed versions only — caps
        at visible_through and excludes aborted (fenced) ranges.  None
        when the table predates overlay metadata (everything visible)."""
        meta = self._overlay_meta()
        if meta is None:
            return None
        absv = F.abs(F.col(VERSION_COL))
        cond = absv <= F.lit(int(meta["visible_through"]))
        for lo, hi in meta.get("aborted", []):
            cond = cond & ~absv.between(int(lo), int(hi))
        return cond

    def _pending_overlay(self) -> DataFrame | None:
        """Committed-but-unfolded changelog rows (ct < abs(version) <=
        vt, aborted ranges excluded), or None when nothing is pending.
        The _vbucket partitioning prunes the history scan to the tail."""
        meta = self._overlay_meta()
        if meta is None:
            return None
        ct, vt = int(meta["compacted_through"]), int(meta["visible_through"])
        if vt <= ct:
            return None
        absv = F.abs(F.col(VERSION_COL))
        cond = (absv > ct) & (absv <= vt)
        for lo, hi in meta.get("aborted", []):
            cond = cond & ~absv.between(int(lo), int(hi))
        # direct-path read of just the tail's version-bucket dirs — the
        # partition-filter form re-lists the WHOLE history per read
        tail = self._changelog_range(ct // VBUCKET_SIZE, vt // VBUCKET_SIZE)
        if tail is None:
            return None
        return tail.filter(cond).select(*self.spec.column_names())

    def _mark_compacted(self) -> None:
        """After a fold (merge write / compact): ct := vt := the max
        version now in current/.  Monotonic — vacuum may physically
        remove the max-version tombstone, and regressing ct would
        resurrect folded changelog rows as overlay."""
        stats = self._current_stats_max()
        meta = self._overlay_meta() or {"aborted": []}
        ct = max(stats, int(meta.get("compacted_through", 0)))
        meta["compacted_through"] = ct
        meta["visible_through"] = max(ct, int(meta.get("visible_through", 0)))
        meta["aborted"] = self._prune_fences(
            [list(r) for r in meta.get("aborted", [])], ct
        )
        self._write_overlay_meta(meta)

    def _prune_fences(self, aborted: list[list[int]], ct: int) -> list[list[int]]:
        """Retire fences wholly below the fold horizon: their orphaned
        rows are PHYSICALLY deleted from the changelog, then the range
        entries are dropped (locally, and — for enrolled tables — staged
        for removal in the open transaction's manifest commit).  Without
        this a crash-heavy history grows the fence list, and every
        read's exclusion predicate, without bound.  Rows are deleted
        BEFORE the entry is dropped, so delta()/snapshot_as_of stay
        sound: once no fence names a range, nothing physically remains
        in it."""
        done = [r for r in aborted if int(r[1]) <= ct]
        if not done:
            return aborted
        self._drop_changelog_ranges(done)
        if self.txn is not None and self.txn.active:
            self.txn.stage_fence_prune(self.spec.name, done)
        return [r for r in aborted if int(r[1]) > ct]

    def _drop_changelog_ranges(self, ranges: list[list[int]]) -> None:
        """Rewrite the changelog vbucket partitions overlapping
        ``ranges`` with the fenced rows filtered out — data-plane I/O
        (the same tmp+swap pattern as current/; a transactional table
        format's DELETE at scale).  Cost is bounded by the crashed
        batches' own vbucket directories, and runs only when a fence
        retires."""
        hit: set[int] = set()
        for lo, hi in ranges:
            hit.update(range(int(lo) // VBUCKET_SIZE, int(hi) // VBUCKET_SIZE + 1))
        schema = self.spec.struct_type().add(OP_COL, T.StringType())
        absv = F.abs(F.col(VERSION_COL))
        keep = F.lit(True)
        for lo, hi in ranges:
            keep = keep & ~absv.between(int(lo), int(hi))
        for vb in sorted(hit):
            d = os.path.join(self.changelog_path, f"{VBUCKET_COL}={vb}")
            if not os.path.isdir(d):
                continue
            kept = self.spark.read.schema(schema).parquet(d).filter(keep)
            tmp = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
            kept.write.mode("overwrite").parquet(tmp)
            final = self.spark.read.schema(schema).parquet(tmp)
            final.write.mode("overwrite").parquet(d)
            shutil.rmtree(tmp, ignore_errors=True)

    def _mark_visible(self, vt_new: int) -> None:
        """After a changelog-append write: publish versions up to
        ``vt_new`` (ct unchanged — the rows live only in the changelog
        until the next fold).  Enrolled tables STAGE the watermark in
        the open transaction instead — nothing becomes durable until
        the txn's single manifest commit."""
        if self.txn is not None:
            self.txn.stage(self, vt_new)
            return
        meta = self._overlay_meta()
        if meta is None:
            meta = {"compacted_through": self._current_stats_max(), "aborted": []}
        meta["visible_through"] = max(int(meta.get("visible_through", 0)), vt_new)
        self._write_overlay_meta(meta)

    def _stamp_base(self) -> int:
        """The version to stamp the next batch above: the visibility
        watermark, raised past any FENCED range (aborted ranges sit
        above vt until a fold passes them; stamping into one would
        collide with a crashed writer's orphaned rows).  Metadata-only —
        the happy path runs no Spark job here; orphan DETECTION happens
        on the failure paths (:meth:`_fence_orphans` from the
        transaction's exception handler and the stale-lock steal)."""
        meta = self._overlay_meta()
        if meta is None:
            return self.max_version()
        base = int(meta["visible_through"])
        for _lo, hi in meta.get("aborted", []):
            base = max(base, int(hi))
        return base

    def _orphan_range(self) -> tuple[int, int] | None:
        """The un-published changelog tail, if any: (lo, hi) abs-version
        range above the visibility watermark and every existing fence.
        One footer-stats job; failure-path only."""
        meta = self._overlay_meta()
        if meta is None:
            return None
        floor = int(meta["visible_through"])
        for _lo, hi in meta.get("aborted", []):
            floor = max(floor, int(hi))
        phys = self._changelog_phys_max(floor // VBUCKET_SIZE)
        return (floor + 1, phys) if phys > floor else None

    def _fence_orphans(self) -> None:
        """Record any un-published changelog tail (rows above the
        visibility watermark and existing fences) as an aborted range,
        so no later write stamps into it and no read ever sees it —
        the reference discards unfinished op batches on journal replay
        (DistributedOperationQueue.java:82-103).  Called on the failure
        paths only: after a write body raises (while still holding the
        commit reservation, so the probe is serialized against other
        writers) and after stealing a crashed writer's expired lock.
        Tables enrolled in a TransactionLog fence through its manifest
        instead (the txn context's failure path)."""
        rng = self._orphan_range()
        if rng is None:
            return
        meta = self._overlay_meta()
        meta.setdefault("aborted", []).append(list(rng))
        self._write_overlay_meta(meta)

    # -- reads (continued) -------------------------------------------------

    def snapshot(self) -> DataFrame:
        """All current rows including tombstones — current/ plus the
        pending changelog overlay, LWW-merged.

        While the overlay stays small (one append batch is bounded by
        ``append_threshold``) the merge never shuffles the table: the
        overlay is LWW-collapsed on its own, then its key set
        broadcast-splits current/ into uncontested rows (kept as-is via
        a broadcast anti-join) and contested rows (broadcast semi-join,
        re-merged with the overlay in a window over only that small
        set).  The overlay grows across successive append-mode writes,
        so past ``append_threshold * overlay_fold_factor`` unfolded
        versions the broadcast hint is dropped and the same split runs
        as shuffle joins (AQE still broadcasts if runtime stats allow)
        — a long un-compacted append streak degrades to a shuffle, it
        never OOMs the driver.  With nothing pending this is exactly
        the bare current/ scan."""
        df = self._read_current_raw()
        cur = df.drop(KBUCKET_COL) if self.num_buckets else df
        pend = self._pending_overlay()
        if pend is None:
            return cur
        meta = self._overlay_meta()
        bound = self.append_threshold * self.overlay_fold_factor
        small = (
            int(meta["visible_through"]) - int(meta["compacted_through"]) <= bound
        )
        hint = F.broadcast if small else (lambda d: d)
        pk = list(self.spec.primary_key)
        ov = _latest_by_abs_version(pend, pk)
        ovk = ov.select(*pk)
        contested = cur.join(hint(ovk), pk, "left_semi")
        merged = _latest_by_abs_version(contested.unionByName(ov), pk)
        return cur.join(hint(ovk), pk, "left_anti").unionByName(merged)

    def live(self) -> DataFrame:
        """P5: the live view — tombstones stripped."""
        return self.snapshot().filter(F.col(VERSION_COL) >= 0)

    def _live_hits(self, predicate=None, keys: DataFrame | None = None) -> DataFrame:
        """Live rows matching ``predicate`` (or whose pk appears in
        ``keys``) with the pending overlay LWW-merged — the write path's
        hit scan.

        Cheaper than ``live().filter(...)``: the full snapshot() merge
        anti/semi-splits the WHOLE table on the overlay key set before
        the filter can prune anything.  Here the filter pushes down to
        the current/ parquet scan and the (small) overlay rides along
        complete; the LWW window then runs over hits + overlay only.
        Sound because an overlay row always outranks the same key's
        current row (overlay versions ∈ (ct, vt], current ≤ ct): for a
        key with any overlay row the merge winner is an overlay row
        whether or not the current row survived the pushed filter, and
        for a key with none the pushed filter equals the post-merge
        filter.  The final post-merge ``predicate`` filter drops keys
        whose LATEST row no longer matches."""
        pk = list(self.spec.primary_key)
        cur = self._read_current_raw()
        if self.num_buckets:
            cur = cur.drop(KBUCKET_COL)
        pend = self._pending_overlay()
        if keys is not None:
            keyset = keys.select(*[c for c in keys.columns if c in pk])
            cur = cur.join(keyset, pk, "left_semi")
            if pend is not None:
                pend = pend.join(keyset, pk, "left_semi")
        if pend is None:
            base = cur if predicate is None else cur.filter(predicate)
        else:
            pre = cur if predicate is None else cur.filter(predicate)
            base = _latest_by_abs_version(pre.unionByName(pend), pk)
            if predicate is not None:
                base = base.filter(predicate)
        return base.filter(F.col(VERSION_COL) >= 0)

    def point_lookup(self, key_values: Sequence[tuple | object]) -> DataFrame:
        """S1/S3 point reads with PHYSICAL bucket pruning — the
        engine's analog of a HandlerSocket indexed point `find`
        (DatabaseExecutorForHandlerSocket.findInternal :120-132).

        ``key_values``: primary-key tuples (bare values for a 1-column
        pk).  With a bucketed layout the pk-hash bucket of each key is
        computed ON THE DRIVER in pure Python (``functions.xxh`` is
        bit-identical to the layout's ``xxhash64`` — no Spark job at
        all for int/str/bool keys; exotic key types fall back to one
        keys-sized job, bounded by the number of keys requested, never
        by table size) and the scan filters on the ``_kb`` PARTITION
        column — so a point read touches O(|keys|/num_buckets) of the
        table's files regardless of table size, mirroring the B-tree
        descent the reference gets from MySQL, and the whole lookup is
        ONE job.  Falls back to a broadcast semi-join on the unbucketed
        layout.  Tombstones are stripped (P5)."""
        pk = list(self.spec.primary_key)
        vals = [
            (kv if isinstance(kv, tuple) else (kv,)) for kv in key_values
        ]

        def _keys_df():
            pk_schema = T.StructType(
                [self.spec.struct_type()[c] for c in pk]
            )
            return self.spark.createDataFrame(vals, pk_schema)

        # small single-column key sets match by an EXACT literal isin —
        # no keys DataFrame, no broadcast exchange, no driver-RDD setup
        # per call (the high-churn group-commit read path).  Large
        # batches route to the broadcast semi-join instead: a
        # multi-thousand-literal In costs more to plan and push than
        # the one broadcast exchange it avoids (r8 regression: the
        # 2,000-id open/close batch ran 3× slower on the literal form).
        literal_keys = len(pk) == 1 and len(vals) <= 256

        def _match(df):
            if literal_keys:
                return df.filter(F.col(pk[0]).isin([v[0] for v in vals]))
            return df.join(F.broadcast(_keys_df()), pk, "left_semi")

        if not self.num_buckets:
            return _match(self.live())
        py_buckets = {xxh.kbucket_of(v, self.num_buckets) for v in vals}
        if None in py_buckets:  # non-replicable cast: one keys-sized job
            py_buckets = {
                r["_b"]
                for r in _keys_df().select(self._kbucket().alias("_b")).collect()
            }
        buckets = sorted(py_buckets)
        # Read the pruned bucket DIRECTORIES BY PATH instead of
        # partition-filtering a full-table listing: the filter form
        # still lists and plans over every bucket directory, a fixed
        # per-read cost that dominates point reads on big tables
        # (measured at 15M rows / 128 buckets: 0.67 s listing-filter vs
        # 0.25 s direct paths for the same 20-key read) — but ONLY
        # while the key set actually prunes.  A big batch whose keys
        # cover most buckets reads the same bytes either way and would
        # pay fresh per-call dir probes + per-dir planning for nothing,
        # so it falls back to the partition-filtered full-table scan
        # (the r7 shape; its listing amortizes across the batch).
        # Small batches (the ≤k-key group-commit read) always take the
        # direct path: at the top rung the full-table listing alone
        # dwarfs reading k bucket dirs, whatever the coverage ratio.
        direct_path = len(vals) <= 64 or len(buckets) * 2 <= self.num_buckets
        if not direct_path:
            raw = self._read_current_raw().filter(
                F.col(KBUCKET_COL).isin(buckets)
            )
        else:
            dirs = [
                os.path.join(self.current_path, f"{KBUCKET_COL}={b}")
                for b in buckets
            ]
            dirs = [d for d in dirs if os.path.isdir(d)]
            if not dirs:
                raw = self._read_current_raw().filter(F.lit(False))
            else:
                raw = (
                    self.spark.read.option("basePath", self.current_path)
                    .schema(self._full_schema())
                    .parquet(*dirs)
                )
        # the key match: an exact literal isin (reaches the scan as a
        # PushedFilter → row-group stats pruning where the layout
        # allows) for small single-column sets, a broadcast semi-join
        # otherwise
        hit = _match(raw.drop(KBUCKET_COL))
        pend = self._pending_overlay()
        if pend is not None:
            # append-path writes live only in the changelog until the
            # next fold: point reads must LWW-merge the (keys-bounded)
            # overlay slice over the pruned bucket scan
            hit = _latest_by_abs_version(hit.unionByName(_match(pend)), pk)
        return hit.filter(F.col(VERSION_COL) >= 0)

    def max_version(self) -> int:
        """A7: the version counter (max abs(version)); parquet column
        stats make this near-free."""
        row = self.snapshot().agg(F.max(F.abs(F.col(VERSION_COL)))).first()
        return int(row[0] or 0)

    def count(self) -> int:
        """S9/A1: live row count. The reference memoizes this in an
        AtomicLong (DatabaseExecutor.count :139-155); parquet footers
        make recount cheap enough."""
        return self.live().count()

    # -- optimistic commit sequence (U6 analog) ----------------------------
    #
    # The reference serializes concurrent RPC writers with a per-key
    # lock manager (DistributedLocker.java:103-160).  Here concurrent
    # *jobs* (e.g. two ingest pipelines) are serialized by a monotonic
    # commit sequence in a ``_commits/`` sidecar: each write reserves
    # commit id N+1 via an atomic put-if-absent (O_CREAT|O_EXCL — the
    # same primitive a transactional table format uses on HDFS/local;
    # on S3 it is a conditional PUT), runs its read-merge-write against
    # state that provably contains every committed write (no commit can
    # land without the reservation we now hold), then finalizes the
    # reservation into ``N+1.commit`` (atomic rename).  A loser's
    # reservation fails; it backs off and retries the WHOLE operation —
    # recomputing versions and merges against the winner's state — so
    # interleaved writers all land, none lost.
    #
    # The reservation is taken BEFORE the bucket overwrite on purpose:
    # validate-at-publish ("check the token moved, then write") is
    # unsound on overwrite storage — by the time the token mismatch is
    # seen the stale merge has already clobbered the winner's bucket
    # and there is nothing to roll back to.  Reserve-then-write keeps
    # the data write exclusive; a writer that dies mid-commit leaves a
    # ``.lock`` whose lease expires after LOCK_TTL_SEC and is stolen.

    @property
    def commits_path(self) -> str:
        return os.path.join(self.root, COMMITS_DIR)

    def last_commit_id(self) -> int:
        ids = [
            int(f.split(".", 1)[0])
            for f in self.backend.list(self.commits_path)
            if f.endswith(".commit")
        ]
        return max(ids, default=0)

    def _reserve_commit(self, cid: int) -> str | None:
        lock = os.path.join(self.commits_path, f"{cid}.lock")
        payload = f"pid={os.getpid()} ts={time.time()}\n".encode()
        if self.backend.put_if_absent(lock, payload):
            return lock
        mt = self.backend.mtime(lock)
        if mt is not None and time.time() - mt > LOCK_TTL_SEC:
            # steal a crashed writer's expired lease; the dead writer
            # may have appended without publishing — fence its tail
            # once we next hold the reservation
            self.backend.delete(lock)
            self._fence_after_acquire = True
        return None

    def _transact(self, body: Callable[[], object], op: str) -> object:
        """Run ``body`` (the full read-stamp-merge-write of one write
        op) holding the next commit reservation; retry with backoff
        when a concurrent writer holds it.

        Enrolled tables delegate serialization AND atomicity to the
        shared TransactionLog: inside an open transaction the body runs
        directly (the outer context holds the single lock); a bare call
        opens a one-verb transaction around the body."""
        if self.txn is not None:
            if self.txn.active:
                return body()
            with self.txn.transaction():
                return body()
        for attempt in range(_MAX_COMMIT_RETRIES):
            nxt = self.last_commit_id() + 1
            lock = self._reserve_commit(nxt)
            if lock is None:
                time.sleep(min(0.05 * (attempt + 1), 1.0))
                continue
            if getattr(self, "_fence_after_acquire", False):
                try:
                    self._fence_orphans()
                finally:
                    self._fence_after_acquire = False
            try:
                result = body()
            except BaseException:
                # failed writes release the reservation (no commit id
                # is burned); any half-appended changelog tail is
                # fenced FIRST — while this writer still serializes the
                # table — so no later write can stamp into it
                try:
                    self._fence_orphans()
                except Exception:
                    pass
                self.backend.delete(lock)
                raise
            # meta stays Spark-free: a max_version() probe here would
            # run an extra job inside the critical section per write.
            # Publish order: the .commit object appears first (atomic
            # replace), then the lock is released — a crash in between
            # leaves a stale lock alongside the commit, which the next
            # writer's reservation on cid+1 never contends with.
            self.backend.replace(
                os.path.join(self.commits_path, f"{nxt}.commit"),
                json.dumps({"op": op, "pid": os.getpid()}).encode(),
            )
            self.backend.delete(lock)
            return result
        raise WriteConflictError(
            f"could not reserve commit after {_MAX_COMMIT_RETRIES} attempts"
        )

    # -- writes (U1-U4) ----------------------------------------------------
    #
    # Every write takes a ``mode``:
    #
    # - ``merge`` — stamp, append to the changelog, LWW-merge into
    #   current/ (read touched buckets, rewrite them).  Amortizes well
    #   for bulk batches; pays a fixed multi-job floor per call.
    # - ``append`` — stamp, append to the changelog, publish via the
    #   visibility watermark and STOP.  No bucket is read or rewritten;
    #   reads overlay the pending tail until the next merge-mode write
    #   or ``compact()`` folds it down.  This is the small-batch /
    #   high-churn path (SCALE.md §12) — the engine's analog of the
    #   reference's B-tree point update (FileRepository.updateInternal
    #   :226-286), where a rename is one index write, not a segment
    #   rewrite.
    # - ``auto`` — append iff the batch is at or below
    #   ``append_threshold`` rows (row count comes free from the
    #   stamping pass), else merge.

    # Spec types the driver-side small-batch writer can emit with exact
    # parquet physical-type parity to Spark's writer; anything else
    # (timestamp, array) falls back to the distributed append.
    _DRIVER_PA_TYPES = {
        "boolean", "byte", "short", "int", "long",
        "float", "double", "string", "binary",
    }

    def _driver_appendable(self) -> bool:
        return all(c.type in self._DRIVER_PA_TYPES for c in self.spec.columns)

    def _driver_append_rows(
        self, rows: list, op: str, base: int, negate: bool = False
    ) -> int:
        """Stamp and changelog-append a SMALL batch entirely driver-side
        — zero Spark jobs.  ``rows`` are collected Rows bounded by
        ``append_threshold`` (metadata-scale, like every other bounded
        collect in this engine); versions are assigned densely in pk
        order and the parquet file(s) are written with pyarrow straight
        into the changelog's version-bucket directories, byte-compatible
        with Spark-written changelog files (same columns, same types,
        snappy).  This is the engine's closest analog of the reference's
        single-process B-tree point update (FileRepository.
        updateInternal :226-286): a rename touches one index page there,
        one small parquet file here — not a bucket rewrite, not even a
        Spark job."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if self.txn is not None and self.txn.active:
            self.txn.touch(self)
        stamped = self._stamp_rows_driver(rows, base, negate)
        self._write_stamped_driver(stamped, op)
        return len(rows)

    def _stamp_rows_driver(
        self, rows: list, base: int, negate: bool = False
    ) -> list:
        """Dense pk-ordered version stamps for a driver-side batch —
        the stamping half of :meth:`_driver_append_rows`, split out so
        group commits can stamp k batches independently (per-op version
        boundaries) yet write them as ONE file per version bucket."""
        pk = list(self.spec.primary_key)
        rows = sorted(rows, key=lambda r: tuple((r[k] is None, r[k]) for k in pk))
        out = []
        for i, r in enumerate(rows):
            v = base + i + 1
            if negate:
                v = -v
            out.append((r, v))
        return out

    def _write_stamped_driver(self, stamped: list, op: str) -> None:
        """Write pre-stamped (row, version) pairs into the changelog,
        one parquet file per touched version bucket.  File layout is
        independent of how many ops produced the rows — version values
        carry ALL ordering semantics — so a k-op group commit leaves
        ONE file per vbucket instead of k (every subsequent overlay
        read lists the pending tail; k tiny files per group made
        sustained group traffic O(groups²) in listing cost)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        pa_types = {
            "boolean": pa.bool_(), "byte": pa.int8(), "short": pa.int16(),
            "int": pa.int32(), "long": pa.int64(), "float": pa.float32(),
            "double": pa.float64(), "string": pa.string(), "binary": pa.binary(),
        }
        by_vb: dict[int, list] = {}
        for r, v in stamped:
            by_vb.setdefault(abs(v) // VBUCKET_SIZE, []).append((r, v))
        for vb, rs in by_vb.items():
            d = os.path.join(self.changelog_path, f"{VBUCKET_COL}={vb}")
            os.makedirs(d, exist_ok=True)
            names = [c.name for c in self.spec.columns] + [VERSION_COL, OP_COL]
            arrays = [
                pa.array([r[c.name] for r, _ in rs], pa_types[c.type])
                for c in self.spec.columns
            ]
            arrays.append(pa.array([v for _, v in rs], pa.int64()))
            arrays.append(pa.array([op] * len(rs), pa.string()))
            pq.write_table(
                pa.Table.from_arrays(arrays, names=names),
                os.path.join(d, f"part-{uuid.uuid4().hex}.snappy.parquet"),
                compression="snappy",
            )

    def _try_driver_append(
        self, hit: DataFrame, op: str, base: int, negate: bool = False
    ) -> int | None:
        """Attempt the driver-side append for ``hit``: collect up to
        ``append_threshold`` rows (take() lets point predicates stop
        early); returns the new watermark, or None when the batch is
        too large or the schema unsupported — caller falls back to a
        distributed path."""
        if not self._driver_appendable():
            return None
        t0 = time.time()
        rows = hit.take(self.append_threshold + 1)
        t1 = time.time()
        if len(rows) > self.append_threshold:
            return None
        n = self._driver_append_rows(rows, op, base, negate)
        t2 = time.time()
        self._mark_visible(base + n)
        t3 = time.time()
        # machine-recorded per-phase breakdown of the small-batch write
        # (hit scan / parquet append / watermark publish) — bench reads
        # this to prove where the namespace-op floor actually sits
        self.last_write_phases = {
            "hit_scan_sec": round(t1 - t0, 4),
            "driver_append_sec": round(t2 - t1, 4),
            "publish_sec": round(t3 - t2, 4),
        }
        return base + n

    def _publish(self, stamped_ops: DataFrame, op: str, vt_new: int, mode: str) -> None:
        """Common write tail: changelog append + either fold (merge)
        or visibility bump (append)."""
        self._append_changelog(stamped_ops)
        if mode == "append":
            self._mark_visible(vt_new)
        else:
            self._merge_write(stamped_ops.drop(OP_COL))

    def _route(self, mode: str, n_rows: int) -> str:
        if mode == "auto":
            return "append" if n_rows <= self.append_threshold else "merge"
        if mode not in ("merge", "append"):
            raise ValueError(f"unknown write mode {mode!r}")
        return mode

    def _write_op(
        self, hit: DataFrame, op: str, mode: str, negate: bool = False
    ) -> tuple[int, int]:
        """Shared write tail (runs inside ``_transact``): stamp + publish
        ``hit`` under ``mode``; returns (new watermark, rows written).

        ``append``/``auto`` first try the driver-side small-batch
        writer (zero Spark jobs past the bounded collect); a too-large
        batch falls back to the distributed stamp — to a changelog-only
        publish for explicit ``append``, to a fold for ``auto``."""
        if mode not in ("merge", "append", "auto"):
            raise ValueError(f"unknown write mode {mode!r}")
        # phases are per-write evidence: clear up front so a write that
        # takes the distributed path never reports a PREVIOUS write's
        # driver-append breakdown as its own
        self.last_write_phases = {}
        if self.txn is not None:
            # a fold inside an uncommitted transaction would leak rows
            # into current/ before the manifest commit — enrolled
            # tables always publish through the changelog
            mode = "append"
        elif mode in ("append", "auto"):
            meta = self._overlay_meta()
            if meta is not None and (
                int(meta["visible_through"]) - int(meta["compacted_through"])
                > self._overlay_tail_bound(int(meta["compacted_through"]))
            ):
                # the pending overlay is past the read-amplification
                # bound: fold this write (the merge carries the whole
                # overlay down with it) instead of growing it further
                mode = "merge"
        pk = list(self.spec.primary_key)
        base = self._stamp_base()
        if mode in ("append", "auto"):
            vt = self._try_driver_append(hit, op, base, negate)
            if vt is not None:
                return vt, vt - base
            mode = "append" if mode == "append" else "auto"
        # The distributed tail evaluates ``hit`` up to three times:
        # the stamping counts job, the changelog append, and the merge
        # write.  Persist the batch for the op's duration (released in
        # the finally) so the source subtree — often a predicate scan
        # of a big table — computes once; MEMORY_AND_DISK keeps lost
        # blocks recomputable (stamping is deterministic), and the
        # size gate skips the double-write for bulk-load-sized batches
        # where recomputing a scan beats spooling it to disk.
        cached = None
        try:
            est = int(
                hit._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            est = 1 << 62
        if est <= WRITE_BATCH_PERSIST_MAX_BYTES:
            from pyspark import StorageLevel

            cached = hit.persist(StorageLevel.MEMORY_AND_DISK)
            hit = cached
        try:
            stamped, n = _stamp_versions_n(hit, pk, base, negate)
            stamped = self._cast_spec(stamped)
            if mode == "auto":
                # merge-on-read routing: a batch that keeps the pending
                # tail inside the read-amplification bound stays
                # changelog-resident (O(batch) write); past it, fold
                mode = "append" if self._mor_append_ok(n) else "merge"
                self.last_write_phases["route"] = f"auto->{mode}"
            self._publish(stamped.withColumn(OP_COL, F.lit(op)), op, base + n, mode)
            return base + n, n
        finally:
            if cached is not None:
                cached.unpersist()

    def _overlay_tail_bound(self, ct: int) -> int:
        """Max pending overlay versions before auto-routed writes fold:
        the absolute small-batch bound, widened by ``mor_tail_fraction``
        of the folded-rows watermark at scale."""
        return max(
            self.append_threshold * self.overlay_fold_factor,
            int(self.mor_tail_fraction * ct),
        )

    def _mor_append_ok(self, n: int) -> bool:
        """Would appending ``n`` more rows keep the pending changelog
        tail within the merge-on-read read-amplification bound?"""
        meta = self._overlay_meta()
        if meta is None:
            return False
        vt, ct = int(meta["visible_through"]), int(meta["compacted_through"])
        return (vt - ct + n) <= self._overlay_tail_bound(ct)

    def upsert(self, rows: DataFrame, overwrite: bool = True, mode: str = "merge") -> int:
        """U1: insert-with-overwrite-flag (insertInternal :281-296).

        ``overwrite=False`` raises if any incoming pk already exists
        live (exists & !overwrite → error); otherwise existing rows are
        replaced.  Returns the new max version (the watermark after
        this write — safe as a delta()/sync_from cursor).
        """

        def body() -> int:
            pk = list(self.spec.primary_key)
            if not overwrite:
                live = self.snapshot().filter(F.col(VERSION_COL) >= 0)
                clash = rows.join(live, pk, "left_semi")
                if clash.take(1):
                    raise ValueError("upsert(overwrite=False): key already exists")
            return self._write_op(rows, "UPSERT", mode)[0]

        return self._transact(body, "UPSERT")  # type: ignore[return-value]

    def group_upsert(self, batches, op: str = "UPSERT") -> int:
        """Group commit: apply k independent small upsert batches in ONE
        lock/changelog/publish cycle — the engine analog of the
        reference namenode absorbing 100 concurrent client syncs
        (BenchmarkerForNamenode.java sync2: each client op is tiny, the
        52 ops/s throughput comes from overlap, not per-op speed).

        Each batch keeps its own identity: versions are stamped densely
        batch-after-batch in submission order, exactly the stamps k
        serial ``upsert(mode="append")`` calls would have produced —
        ``delta()`` / LWW replay cannot tell the difference.  What is
        amortized is the fixed per-commit machinery: one lock
        reservation, one watermark publish, and one commit object for
        the whole group (the changelog still gets one small parquet
        file per batch per touched version bucket — per-batch stamping
        is what keeps two batches hitting the SAME key resolving in
        submission order under LWW).

        Constraints: every batch must fit the driver small-batch bound
        (``append_threshold`` rows) and the schema must be
        driver-appendable — this is the high-churn point-write surface,
        not a bulk loader (use ``upsert(mode="merge")`` for bulk).
        Overwrite semantics are upsert-replace (LWW by version).  If
        the appended tail crosses the merge-on-read read-amplification
        bound, one fold runs after the group commits (its own cycle),
        so the read-tax contract survives sustained group traffic.
        Returns the new visibility watermark.
        """
        batches = list(batches)
        if not batches:
            return self._stamp_base()
        if not self._driver_appendable():
            raise ValueError("group_upsert: schema is not driver-appendable")

        def body() -> int:
            base = self._stamp_base()
            # ONE Spark job collects every batch: the per-op scans are
            # unioned under a group index and taken together — k point
            # reads cost one job's latency, not k (the serial-job floor
            # is exactly what the published row's 100 threads overlap)
            tagged = None
            for i, b in enumerate(batches):
                tb = b.withColumn("_gop", F.lit(i))
                tagged = tb if tagged is None else tagged.unionByName(tb)
            limit = self.append_threshold * len(batches)
            all_rows = tagged.take(limit + 1)
            if len(all_rows) > limit:
                raise ValueError(
                    "group_upsert: group exceeds the driver small-batch "
                    f"bound ({limit} rows); use upsert(mode='merge')"
                )
            collected = [[] for _ in batches]
            for r in all_rows:
                collected[r["_gop"]].append(r)
            for rows in collected:
                if len(rows) > self.append_threshold:
                    raise ValueError(
                        "group_upsert: batch exceeds append_threshold "
                        f"({self.append_threshold}); use upsert(mode='merge')"
                    )
            t0 = time.time()
            if self.txn is not None and self.txn.active:
                self.txn.touch(self)
            # per-batch stamping preserves op boundaries in version
            # space (same-key conflicts resolve in submission order
            # under LWW); one changelog file per vbucket for the WHOLE
            # group — see group_point_update
            stamped: list = []
            n = 0
            for rows in collected:
                stamped.extend(self._stamp_rows_driver(rows, base + n))
                n += len(rows)
            self._write_stamped_driver(stamped, op)
            t1 = time.time()
            self._mark_visible(base + n)
            self.last_write_phases = {
                "n_ops": len(collected),
                "driver_append_sec": round(t1 - t0, 4),
                "publish_sec": round(time.time() - t1, 4),
            }
            return base + n

        vt = self._transact(body, f"GROUP_{op}x{len(batches)}")
        if self.txn is None and not self._mor_append_ok(0):
            self.compact()
        return vt  # type: ignore[return-value]

    def group_point_update(self, ops, op: str = "UPDATE") -> int:
        """Group commit of PK point updates: k read-modify-write ops in
        one lock/changelog/publish cycle AND one bucket-pruned Spark
        job — the scale form of :meth:`group_upsert` for the high-churn
        namenode surface (sync/append lease reacquires: read one row by
        pk, mutate a field, write back; BenchmarkerForNamenode.java
        sync2's 100 concurrent clients are exactly this).

        ``ops``: sequence of ``(key_values, assignments)`` — pk tuples
        (bare values for a 1-column pk) and a dict of column → plain
        Python value.  The group's current rows are fetched with ONE
        :meth:`point_lookup` over the union of all keys, so the read
        job scans O(|keys|/num_buckets) of the table's files via
        ``_kb`` partition pruning — flat in table size, where
        ``group_upsert`` over caller-built ``filter(pk == k)`` batches
        re-scans the table per group (the r7 verdict's sf100
        group-commit floor).  Ops then apply serially against a
        driver-side working copy, so an op reads every earlier op's
        writes — version stamps and same-key LWW outcomes are
        IDENTICAL to k serial ``update_where(mode="append")`` calls
        (pytest-pinned).  Keys with no live row are no-ops, exactly as
        an update matching zero rows.  Returns the new watermark.
        """
        ops = list(ops)
        if not ops:
            return self._stamp_base()
        if not self._driver_appendable():
            raise ValueError("group_point_update: schema is not driver-appendable")
        pk = list(self.spec.primary_key)
        norm: list[tuple[list[tuple], dict]] = []
        for kv, assigns in ops:
            keys = [k if isinstance(k, tuple) else (k,) for k in kv]
            norm.append((keys, dict(assigns)))
        all_keys = sorted({k for keys, _ in norm for k in keys})
        limit = self.append_threshold * len(norm)
        if len(all_keys) > limit:
            raise ValueError(
                "group_point_update: group exceeds the driver small-batch "
                f"bound ({limit} keys); use update_where(mode='merge')"
            )

        def body() -> int:
            base = self._stamp_base()
            # ONE bucket-pruned job for the whole group's reads
            fetched = self.point_lookup(all_keys).take(len(all_keys))
            state = {
                tuple(r[c] for c in pk): r.asDict() for r in fetched
            }
            # materialize and validate every op's batch BEFORE the first
            # append — an oversize op must fail the whole group without
            # a partial commit or burned versions
            staged: list[list[dict]] = []
            for keys, assigns in norm:
                batch = []
                for k in keys:
                    cur = state.get(k)
                    if cur is None:
                        continue
                    cur = dict(cur)
                    cur.update(assigns)
                    state[k] = cur
                    batch.append(cur)
                if len(batch) > self.append_threshold:
                    raise ValueError(
                        "group_point_update: op exceeds append_threshold "
                        f"({self.append_threshold}); use update_where(mode='merge')"
                    )
                staged.append(batch)
            t0 = time.time()
            if self.txn is not None and self.txn.active:
                self.txn.touch(self)
            # per-op stamping preserves op boundaries in version space
            # (same-key conflicts resolve in submission order); the
            # WRITE is one file per vbucket for the whole group —
            # version values carry the ordering, file count stays O(1)
            # per group so sustained group traffic's overlay reads
            # don't degrade with per-op file litter
            stamped: list = []
            n = 0
            for batch in staged:
                stamped.extend(self._stamp_rows_driver(batch, base + n))
                n += len(batch)
            self._write_stamped_driver(stamped, op)
            t1 = time.time()
            self._mark_visible(base + n)
            self.last_write_phases = {
                "n_ops": len(norm),
                "driver_append_sec": round(t1 - t0, 4),
                "publish_sec": round(time.time() - t1, 4),
            }
            return base + n

        vt = self._transact(body, f"GROUPPT_{op}x{len(norm)}")
        if self.txn is None and not self._mor_append_ok(0):
            self.compact()
        return vt  # type: ignore[return-value]

    def update_where(
        self, predicate, assignments: dict[str, object], mode: str = "merge"
    ) -> int:
        """U2: field-masked update — read-modify-write of matching rows,
        version bumped (updateInternal :298-314; the bitmask of
        File.update :118-134 becomes the ``assignments`` dict).
        Returns the new max version (post-write watermark)."""

        def body() -> int:
            upd = self._live_hits(predicate=predicate)
            for col, val in assignments.items():
                upd = upd.withColumn(col, val if hasattr(val, "_jc") else F.lit(val))
            upd = self._cast_spec(upd)
            return self._write_op(upd, "UPDATE", mode)[0]

        return self._transact(body, "UPDATE")  # type: ignore[return-value]

    def delete_where(self, predicate, mode: str = "merge") -> int:
        """U3: tombstone delete — matching live rows get version =
        −(next version) and stay (deleteInternal :316-330).
        Returns the new max version (post-write watermark)."""

        def body() -> int:
            hit = self._live_hits(predicate=predicate)
            return self._write_op(hit, "DELETE", mode, negate=True)[0]

        return self._transact(body, "DELETE")  # type: ignore[return-value]

    def _tombstones_for_keys(self, keys: DataFrame) -> DataFrame:
        """The delete set for :meth:`delete_where_keys`: live rows
        semi-joined against the key DataFrame, tombstone-stamped.  Kept
        separate so plan tests can assert the key set stays distributed
        (LeftSemi join — never a collect()+isin literal)."""
        return self._tombstones_for_keys_n(keys)[0]

    def _tombstones_for_keys_n(self, keys: DataFrame) -> tuple[DataFrame, int, int]:
        """(tombstones, stamp base, row count) — count comes free from
        the stamping pass."""
        pk = list(self.spec.primary_key)
        hit = self._live_hits(keys=keys)
        base = self._stamp_base()
        tomb, n = _stamp_versions_n(hit, pk, base, negate=True)
        return self._cast_spec(tomb), base, n

    def delete_where_keys(self, keys: DataFrame, mode: str = "merge") -> int:
        """U3 set-based form: tombstone every live row whose pk appears
        in ``keys`` (a DataFrame holding pk columns).  This is the H5
        recursive-delete write path (StateManager.deleteFileByFile
        :604-632) done as a semi-join — the key set never visits the
        driver, unlike a collect()+isin literal.  Returns the number of
        rows tombstoned."""

        def body() -> int:
            hit = self._live_hits(keys=keys)
            return self._write_op(hit, "DELETE", mode, negate=True)[1]

        return self._transact(body, "DELETE")  # type: ignore[return-value]

    def append_ops(self, ops: DataFrame, op: str = "APPLY") -> int:
        """Changelog-append-ONLY apply of fully-stamped signed rows (the
        U4 shape: full row schema incl. ``version``; tombstones carry a
        negative sign).  Nothing in current/ is touched — the rows are
        published through the visibility watermark and folded by the
        next merge-mode write or ``compact()``.  Returns the new
        visibility watermark.  This is the SCALE.md §12 high-churn
        ingest surface: append micro-batches at O(batch) cost, pay the
        rewrite once per compaction cycle.

        Rows whose abs(version) is at or below the fold horizon
        (``compacted_through``) CANNOT publish through the watermark —
        the pending overlay reads only (ct, vt], so they would be
        appended yet permanently invisible.  A replica replaying an
        older-versioned op after a compact hits exactly this; such rows
        are split off and folded through the LWW merge path instead
        (same per-key outcome as the standalone U4 ``apply_directly``:
        they win iff newer than the stored version).  Inside an open
        multi-verb transaction a fold would leak pre-commit state, so
        the split is rejected loudly there — replay below the horizon
        is a standalone/sync surface, not a namespace-verb one."""

        def body() -> int:
            rows = self._cast_spec(ops)
            meta = self._overlay_meta()
            ct = int(meta["compacted_through"]) if meta else 0
            absv = F.abs(F.col(VERSION_COL))
            row = rows.agg(
                F.max(VERSION_COL), F.min(VERSION_COL), F.min(absv)
            ).first()
            vt_new = max(int(row[0] or 0), -int(row[1] or 0), 0)
            min_abs = int(row[2] or 0)
            if ct and min_abs and min_abs <= ct:
                if self.txn is not None and self.txn.active:
                    raise ValueError(
                        f"append_ops: incoming versions reach {min_abs} "
                        f"<= compacted_through {ct}; below-horizon replay "
                        "cannot publish atomically inside an open "
                        "transaction — run it standalone (sync_from / "
                        "apply_directly)"
                    )
                old = rows.filter(absv <= ct)
                self._append_changelog(old.withColumn(OP_COL, F.lit(op)))
                self._merge_write(old)
                rows = rows.filter(absv > ct)
                if vt_new <= ct:  # every row was below the horizon
                    return self.last_visible()
            fold = (
                self.txn is None
                and meta is not None
                and int(meta["visible_through"]) - ct
                > self.append_threshold * self.overlay_fold_factor
            )
            self._publish(
                rows.withColumn(OP_COL, F.lit(op)),
                op,
                vt_new,
                "merge" if fold else "append",
            )
            return max(vt_new, self.last_visible())

        return self._transact(body, op)  # type: ignore[return-value]

    def last_visible(self) -> int:
        meta = self._overlay_meta()
        return int(meta["visible_through"]) if meta else self.max_version()

    def apply_directly(self, ops: DataFrame) -> None:
        """U4: idempotent replay — apply incoming rows only where
        |incoming version| ≥ |stored version| (last-writer-wins;
        insert/update/deleteDirectly :420-470).  ``ops`` must carry the
        full row schema including signed ``version``."""

        if self.txn is not None:
            self.append_ops(ops)
            return

        def body() -> None:
            rows = self._cast_spec(ops)
            self._append_changelog(rows.withColumn(OP_COL, F.lit("APPLY")))
            self._merge_write(rows)

        self._transact(body, "APPLY")

    # -- CDC / delta (D1-D3) ----------------------------------------------

    def changelog(self) -> DataFrame:
        # explicit schema in the inferred layout's exact column order
        # and types (data cols, version, _op, then the _vbucket
        # partition column, int as partition-value inference yields) —
        # skips the per-call parquet schema inference, identical frame.
        # VERSION_COL is appended only when the spec doesn't already
        # declare it among its own columns (schema.py supports that;
        # a duplicate field would fail the read where inference worked).
        names = [c.name for c in self.spec.columns]
        fields = [self.spec.struct_type()[c] for c in names]
        if VERSION_COL not in names:
            fields.append(T.StructField(VERSION_COL, T.LongType()))
        fields.append(T.StructField(OP_COL, T.StringType()))
        fields.append(T.StructField(VBUCKET_COL, T.IntegerType()))
        return self.spark.read.schema(T.StructType(fields)).parquet(
            self.changelog_path
        )

    def _changelog_range(self, lo_vb: int, hi_vb: int) -> DataFrame | None:
        """Changelog rows from version-bucket dirs [lo_vb, hi_vb],
        read by DIRECT PATH: the filter form still lists every history
        directory (a 15M-row table's init history alone is thousands
        of part files), a fixed per-read cost that dominated the
        overlay half of a point read (measured 1.07 s vs 0.5 s at
        sf100).  None when no directory in the range exists."""
        # enumerate existing vbucket dirs and intersect with the range
        # (never iterate the numeric range itself — a caller passing a
        # far-future version must not walk 2^40 candidate paths)
        try:
            existing = os.listdir(self.changelog_path)
        except OSError:
            return None
        lo_vb, hi_vb = int(lo_vb), int(hi_vb)
        dirs = sorted(
            os.path.join(self.changelog_path, n)
            for n in existing
            if n.startswith(f"{VBUCKET_COL}=")
            and n.split("=", 1)[1].isdigit()
            and lo_vb <= int(n.split("=", 1)[1]) <= hi_vb
        )
        if not dirs:
            return None
        names = [c.name for c in self.spec.columns]
        fields = [self.spec.struct_type()[c] for c in names]
        if VERSION_COL not in names:
            fields.append(T.StructField(VERSION_COL, T.LongType()))
        fields.append(T.StructField(OP_COL, T.StringType()))
        return (
            self.spark.read.option("basePath", self.changelog_path)
            .schema(T.StructType(fields))
            .parquet(*dirs)
        )

    def delta(self, from_version: int, to_version: int) -> DataFrame:
        """D2: version-range delta extraction (getDataIncrement
        :221-249): change-log rows with abs(version) ∈ [from, to].
        The _vbucket partitioning prunes history directories.  Only
        COMMITTED rows qualify — fenced (aborted) ranges and anything
        past the visibility watermark are excluded, so a replica can
        never sync a crashed writer's half-batch."""
        lo_b, hi_b = from_version // VBUCKET_SIZE, to_version // VBUCKET_SIZE
        # direct-path read of just the range's version-bucket dirs —
        # the filter form re-lists the WHOLE history per extraction
        # (see _changelog_range)
        log = self._changelog_range(lo_b, hi_b)
        if log is None:
            return self.changelog().filter(F.lit(False)).drop(VBUCKET_COL)
        vis = self._visible_cond()
        if vis is not None:
            log = log.filter(vis)
        return log.filter(F.abs(F.col(VERSION_COL)).between(from_version, to_version)).drop(
            VBUCKET_COL
        )

    def snapshot_as_of(self, version: int) -> DataFrame:
        """Time travel: reconstruct the table state as of ``version``
        (inclusive) from the change log — LWW per pk over all ops with
        abs(version) ≤ v.  The _vbucket partitioning prunes history
        directories above the target, so reading an old snapshot scans
        history up to v, never the full log tail.  Includes tombstones;
        compose with a ``version >= 0`` filter for the live view
        (:meth:`live_as_of`)."""
        hi_b = version // VBUCKET_SIZE
        # direct-path read of vbucket dirs [0, hi_b] — an old snapshot
        # neither lists nor plans over the history above the target
        log = self._changelog_range(0, hi_b)
        if log is None:
            log = self.changelog().filter(F.lit(False))
        vis = self._visible_cond()
        if vis is not None:
            log = log.filter(vis)
        log = log.filter(F.abs(F.col(VERSION_COL)) <= version).drop(
            VBUCKET_COL, OP_COL
        )
        return _latest_by_abs_version(log, list(self.spec.primary_key))

    def live_as_of(self, version: int) -> DataFrame:
        """P5 over a historical snapshot: live rows as of ``version``."""
        return self.snapshot_as_of(version).filter(F.col(VERSION_COL) >= 0)

    def rollback_to(self, version: int) -> None:
        """Point-in-time restore: make the live view equal to
        :meth:`live_as_of`(version) via forward-written corrections
        (history is append-only; nothing is erased, so the rollback is
        itself rolled back-able).  Two deltas, both key-joined:

        - keys live at ``version`` whose row differs now (changed or
          since-deleted) → re-upsert the old values;
        - keys live now but absent at ``version`` → tombstone.
        """
        pk = list(self.spec.primary_key)
        data_cols = [c for c in self.spec.column_names() if c != VERSION_COL]
        old = self.live_as_of(version).select(*data_cols)
        cur = self.live().select(*data_cols)
        # exceptAll is resolved as a hash anti-join on all columns —
        # one shuffle each side, no row comparison loops
        revert = old.exceptAll(cur)
        if revert.take(1):
            self.upsert(revert)
        # recompute from fresh reads: the upsert swapped the current/
        # files, so pre-upsert DataFrames must not be re-executed (the
        # revert set ⊆ keys-at-v, so the "gone" set is unaffected)
        old_keys = self.live_as_of(version).select(*pk)
        gone = self.live().select(*pk).join(old_keys, pk, "left_anti")
        if gone.take(1):
            self.delete_where_keys(gone)

    def sync_from(self, other: "VersionedTable") -> None:
        """D2/D3 orchestration (restoreIncrementFromMasterServerInternal
        :677-716): catch this replica up to ``other``.  Small gap →
        incremental delta + idempotent merge; no local state → full
        snapshot copy."""
        try:
            my_v = self.max_version()
        except Exception:
            my_v = 0
        if my_v == 0:
            self.init()
            self.apply_directly(other.snapshot())
            return
        delta = other.delta(my_v + 1, other.max_version()).drop(OP_COL)
        self.apply_directly(delta)

    def compact(
        self, zorder_cols: Sequence[str] | None = None, bits: int = 8
    ) -> None:
        """Rewrite current state for read efficiency.

        Default: pk-sorted files (row-group stats = the pk "index").
        With ``zorder_cols``: z-order layout (sources.generic) so
        row-group stats also prune scans on every listed column — the
        reference's secondary indexes (File.java LEASE_HOLDER etc.) as
        one physical layout.  Bucketed tables keep their pk-hash bucket
        dirs (pk partition pruning is preserved) and z-sort *within*
        buckets; unbucketed tables range-repartition on the curve.
        """
        def body() -> None:
            snap = self.snapshot()
            sort_cols: tuple[str, ...] | None = None
            if zorder_cols:
                from adfs_spark.sources.generic import zorder_value

                snap, _ = zorder_value(snap, tuple(zorder_cols), bits=bits)
                sort_cols = ("_zvalue",)
                if not self.num_buckets:
                    n = max(self.spark.sparkContext.defaultParallelism, 1)
                    snap = snap.repartitionByRange(n, "_zvalue")
            if self.num_buckets:
                # MUST keep the bucket partition column: a plain
                # _write_current here leaves current/ unpartitioned while
                # readers expect _kb dirs — later bucket-pruned merges then
                # match nothing and drop the table's other rows.
                self._write_partitions(
                    snap.withColumn(KBUCKET_COL, self._kbucket()), sort_cols=sort_cols
                )
            else:
                self._write_current(snap, sort_cols=sort_cols)
            # snapshot() folded any pending overlay into the rewrite
            self._mark_compacted()

        self._transact(body, "COMPACT")

    def vacuum(
        self, before_version: int, prune_changelog: bool = False
    ) -> int:
        """``deletePhysically`` analog (DistributedDataRepositoryBase-
        OnTable.java:393-418): physically drop tombstone rows whose
        ``abs(version) <= before_version`` from current state — run
        once every consumer (replica sync, delta reader) has passed the
        horizon, exactly like the reference GCs tombstones after
        replication catch-up.  Returns the number of rows removed.

        ``prune_changelog`` additionally deletes changelog version-
        bucket directories that lie entirely below the horizon (a
        driver-side metadata op — at scale this is the transactional
        format's retention job).  After a vacuum, time travel
        (``snapshot_as_of``) to versions at or below the horizon is no
        longer exact — the same retention trade every versioned store
        makes.
        """
        def body() -> int:
            return self._vacuum_body(before_version, prune_changelog)

        return self._transact(body, "VACUUM")  # type: ignore[return-value]

    def _vacuum_body(self, before_version: int, prune_changelog: bool) -> int:
        cond = (F.col(VERSION_COL) < 0) & (
            F.abs(F.col(VERSION_COL)) <= before_version
        )
        snap = self.snapshot()
        n = snap.filter(cond).count()
        if n:
            kept = snap.filter(~cond)
            if self.num_buckets:
                gone_buckets = {
                    r[0]
                    for r in snap.filter(cond)
                    .select(self._kbucket().alias("_b"))
                    .distinct()
                    .collect()
                }
                kept_kb = kept.withColumn(KBUCKET_COL, self._kbucket())
                still = {
                    r[0]
                    for r in kept_kb.select(KBUCKET_COL).distinct().collect()
                }
                rewrite = gone_buckets & still
                if rewrite:
                    self._write_partitions(
                        kept_kb.filter(F.col(KBUCKET_COL).isin(list(rewrite)))
                    )
                # dynamic overwrite cannot write an EMPTY partition: a
                # bucket whose every row was a vacuumed tombstone must
                # have its directory removed outright
                for b in sorted(gone_buckets - still):
                    shutil.rmtree(
                        os.path.join(self.current_path, f"{KBUCKET_COL}={b}"),
                        ignore_errors=True,
                    )
                self._invalidate_current()
            else:
                self._write_current(kept)
        if prune_changelog:
            horizon_bucket = before_version // VBUCKET_SIZE
            if os.path.isdir(self.changelog_path):
                for d in os.listdir(self.changelog_path):
                    if d.startswith(f"{VBUCKET_COL}="):
                        try:
                            vb = int(d.split("=", 1)[1])
                        except ValueError:
                            continue
                        # only buckets ENTIRELY below the horizon
                        if (vb + 1) * VBUCKET_SIZE <= before_version + 1:
                            shutil.rmtree(
                                os.path.join(self.changelog_path, d),
                                ignore_errors=True,
                            )
        return n

    # -- internals ---------------------------------------------------------

    def _merge_write(self, delta_rows: DataFrame) -> None:
        """LWW-merge fully-stamped delta rows into current state.

        Bucketed tables: prune the read to the touched pk-hash buckets
        and dynamically overwrite only those partitions — write cost is
        O(touched buckets), not O(table).  Unbucketed: full rewrite via
        the tmp-swap path.

        Any pending changelog overlay (append-mode writes not yet
        folded) rides along in the same merge, so after every merge
        write current/ is complete through the new watermark and reads
        drop back to the bare scan."""
        pk = list(self.spec.primary_key)
        delta_rows = self._cast_spec(delta_rows)
        pend = self._pending_overlay()
        if pend is not None:
            delta_rows = delta_rows.unionByName(pend)
        if not self.num_buckets:
            raw = self._read_current_raw()
            merged = _latest_by_abs_version(raw.unionByName(delta_rows), pk)
            self._write_current(merged)
            self._mark_compacted()
            self.last_merge_stats = {"touched_buckets": 1, "num_buckets": 1,
                                     "touched_fraction": 1.0}
            return
        with_kb = delta_rows.withColumn(KBUCKET_COL, self._kbucket())
        touched = [r[0] for r in with_kb.select(KBUCKET_COL).distinct().collect()]
        cur = self._read_current_raw().filter(F.col(KBUCKET_COL).isin(touched))
        merged = _latest_by_abs_version(
            cur.unionByName(with_kb),
            pk,
            cluster=(KBUCKET_COL, self.num_buckets),
        )
        self._write_partitions(merged, pre_clustered=True)
        self._mark_compacted()
        # machine-recorded write-amplification evidence: the fraction
        # of pk-hash buckets this merge read + rewrote (1.0 = a spread
        # update paid the full O(table) copy-on-write cost)
        self.last_merge_stats = {
            "touched_buckets": len(touched),
            "num_buckets": self.num_buckets,
            "touched_fraction": round(len(touched) / self.num_buckets, 4),
        }

    def _write_partitions(
        self,
        df_with_kb: DataFrame,
        sort_cols: Sequence[str] | None = None,
        source_external: bool = False,
        pre_clustered: bool = False,
    ) -> None:
        """Write (a subset of) bucket partitions; dynamic overwrite
        replaces only the partitions present in ``df_with_kb``.

        File-count invariant (r9): the write is clustered so each
        touched bucket lands wholly in one task — one file per touched
        bucket at any scale or task count.  Without it every merge
        multiplied current/ files by the write-task count (measured
        64 → 243 files after init + 3 ops at sf0.1; thousands at
        sf100), and every later scan paid the listing + per-file open
        tax (guide §6).  ``pre_clustered=True`` means the CALLER
        already hash-partitioned the frame by the bucket column — the
        merge path does it BELOW the LWW window so the window reuses
        that same exchange (guide §2.4) and clustering costs nothing
        extra; otherwise one explicit exchange is added here, with
        ``num_buckets`` pinned as the partition count because an
        AQE-coalesced keyed repartition can collapse a small frame
        into one task and serialize all the per-bucket file writes.

        The in-task sort leads with the bucket column: the dynamic
        partition writer requires input sorted by the partition
        columns and inserts its own SortExec when the plan cannot
        prove it — leading with ``_kb`` satisfies that requirement as
        a prefix, so the writer sort is elided; on the merge path the
        LWW window already sorted by (bucket, pk, |version|), so this
        explicit sort is itself elided and the pk order inside each
        bucket file survives for free (min/max stats, guide §6).

        The tmp-materialize + read-back exists because merge inputs
        derive from a read of ``current_path`` (overwriting a path
        while reading it is undefined).  ``source_external=True`` (r9)
        skips it when the CALLER proves the frame reads nothing under
        ``current_path`` — init's seed rows — halving the write cost
        of bulk loads.  The tmp dir is itself bucket-partitioned, so
        the read-back sees whole single-bucket files and the final
        write keeps the one-file-per-bucket invariant without a second
        exchange."""
        sort_keys = list(sort_cols or self.spec.primary_key)

        def _clustered(df: DataFrame) -> DataFrame:
            if not pre_clustered:
                df = df.repartition(self.num_buckets, F.col(KBUCKET_COL))
            return df.sortWithinPartitions(KBUCKET_COL, *sort_keys)

        if source_external:
            (
                _clustered(df_with_kb).write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(KBUCKET_COL)
                .parquet(self.current_path)
            )
            self._invalidate_current()
            return
        # Stage to a tmp dir, then swap the touched bucket DIRECTORIES
        # into current/ with filesystem renames (r9).  The tmp
        # materialization is unavoidable (``df_with_kb`` derives from a
        # read of current_path; overwrite-while-reading is undefined),
        # but the old read-back + second dynamic-overwrite write paid a
        # whole extra Spark write cycle per merge (~1 s of the ~3 s
        # sf0.1 upsert) to move bytes the staging write already placed:
        # tmp is partitioned by bucket with one sorted file per touched
        # bucket — ALREADY the exact final layout.  The rename swap is
        # byte-for-byte what Spark's dynamic partition committer does
        # at job commit (delete replaced partition dirs, rename staged
        # dirs into place), minus a full read+write of the data.  Crash
        # story: the changelog holds this op's delta rows until
        # ``_mark_compacted`` runs after the swap (the overlay heals
        # those), and replaced bucket dirs are renamed aside — not
        # deleted — until the swap completes, so earlier-compacted rows
        # (which the overlay tail cannot replay) survive a mid-swap
        # crash too.  Helper sort columns (compact's
        # _zvalue) are projected out BEFORE the staging write (Project
        # preserves ordering, so the in-task sort and the writer-sort
        # elision survive), where the old path dropped them on the
        # read-back.
        tmp = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
        out = _clustered(df_with_kb).select(
            *[F.col(f.name).cast(f.dataType) for f in self._full_schema().fields]
        )
        out.write.mode("overwrite").partitionBy(KBUCKET_COL).parquet(tmp)
        os.makedirs(self.current_path, exist_ok=True)
        # Replaced bucket dirs are renamed ASIDE (outside current/, so
        # readers never see them) rather than rmtree'd before the swap:
        # a crash mid-swap then loses no folded rows — every replaced
        # bucket still exists in the aside dir, where the old
        # rmtree-then-rename deleted rows whose changelog entries were
        # already compacted away (abs(version) <= compacted_through),
        # which the overlay tail could NOT replay (r9 advice).  The
        # aside copies are deleted only after every touched bucket is
        # swapped in.  Recovery from a mid-swap crash: restore the
        # _aside_* dirs (or replay the FULL changelog); the overlay
        # tail alone heals only the yet-uncompacted rows.
        aside = os.path.join(self.root, f"_aside_{uuid.uuid4().hex}")
        made_aside = False
        prefix = f"{KBUCKET_COL}="
        for d in sorted(os.listdir(tmp)):
            if not d.startswith(prefix):
                continue
            dst = os.path.join(self.current_path, d)
            if os.path.isdir(dst):
                if not made_aside:
                    os.makedirs(aside)
                    made_aside = True
                os.rename(dst, os.path.join(aside, d))
            os.rename(os.path.join(tmp, d), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        if made_aside:
            shutil.rmtree(aside, ignore_errors=True)
        self._invalidate_current()

    def _write_current(
        self, df: DataFrame, sort_cols: Sequence[str] | None = None
    ) -> None:
        # Two-phase: materialize to a tmp dir first because ``df`` may be
        # derived from a read of current_path (overwrite-while-reading is
        # undefined).  On a real deployment this layer is a transactional
        # table format; plain parquet + tmp-swap keeps the semantics.
        tmp = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
        out = df.sortWithinPartitions(*(sort_cols or self.spec.primary_key))
        if not self.bucket_by:
            # r9: stage the FINAL layout (spec projection drops helper
            # sort columns; Project preserves the in-task order) and
            # swap the whole directory in with one rename — the old
            # read-back + second overwrite paid a full extra Spark
            # write cycle to reproduce byte-identical files.  Crash
            # window (current/ absent between rm and rename) is
            # strictly smaller than overwrite-mode's own
            # delete-then-write span, and recovery is unchanged: the
            # changelog holds every row until _mark_compacted.
            staged = out.select(
                *[
                    F.col(f.name).cast(f.dataType)
                    for f in self.spec.struct_type().fields
                ]
            )
            writer = staged.write.mode("overwrite")
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            writer.parquet(tmp)
            # rename the old dir aside, swap the staged dir in, delete
            # the aside copy last — current/ is absent only between the
            # two renames (two metadata ops, not an rmtree's duration),
            # and a crash anywhere leaves the old bytes recoverable in
            # _aside_* (r9 advice; see _write_partitions)
            aside = os.path.join(self.root, f"_aside_{uuid.uuid4().hex}")
            had_old = os.path.isdir(self.current_path)
            if had_old:
                os.rename(self.current_path, aside)
            os.rename(tmp, self.current_path)
            if had_old:
                shutil.rmtree(aside, ignore_errors=True)
            self._invalidate_current()
            return
        writer = out.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)
        final = self.spark.read.schema(self.spec.struct_type()).parquet(tmp)
        if self.bucket_by:
            # repartition on the bucket key first: bucketBy hashes with
            # the same Murmur3 as repartition, so each write task holds
            # exactly one bucket — bucket_count files, not tasks×buckets
            (
                final.repartition(self.bucket_count, *[F.col(c) for c in self.bucket_by])
                .write.mode("overwrite")
                .format("parquet")
                .bucketBy(self.bucket_count, *self.bucket_by)
                .sortBy(*self.bucket_by)
                .option("path", os.path.abspath(self.current_path))
                .saveAsTable(self._bucket_table_name)
            )
            self.spark.sql(f"REFRESH TABLE {self._bucket_table_name}")
            shutil.rmtree(tmp, ignore_errors=True)
            return
        w2 = final.write.mode("overwrite")
        if self.partition_by:
            w2 = w2.partitionBy(*self.partition_by)
        w2.parquet(self.current_path)
        shutil.rmtree(tmp, ignore_errors=True)
        self._invalidate_current()

    def _append_changelog(self, ops: DataFrame) -> None:
        if self.txn is not None and self.txn.active:
            self.txn.touch(self)
        out = ops.withColumn(
            VBUCKET_COL, (F.abs(F.col(VERSION_COL)) / VBUCKET_SIZE).cast("long")
        )
        out.write.mode("append").partitionBy(VBUCKET_COL).parquet(self.changelog_path)


class TransactionLog:
    """Cross-table atomic commits — the engine's analog of the single
    FSNamesystem lock under which the reference mutates ``file`` +
    ``block`` + ``lease`` and ships the result as ONE dependency-ordered
    op batch (DistributedOperationQueue.getOperations :82-103; create
    path FSNamesystem.startFileInternal :842-870 → allocateBlock
    :1157-1187).

    Mechanism: every enrolled table's mutations go changelog-append-only
    (rows are physically written but carry versions above the table's
    visibility watermark), and the watermark for ALL enrolled tables
    lives in ONE manifest — ``<root>/_txn/<N>.commit``, a cumulative
    JSON written via the same put-if-absent lock + atomic-rename
    protocol as the per-table commit sequence.  A multi-table verb
    appends to each table, then the transaction commits ONE manifest
    raising every touched table's watermark together: readers see all
    of the verb's writes or none of them.

    Failure atomicity: a transaction that raises (or a writer that
    dies) leaves appended rows above the committed watermarks; the
    failure path — the context's exception handler, or the next writer
    after stealing the expired lock — records those tails as fenced
    (aborted) ranges in a fence-only manifest commit, so they stay
    invisible forever and later writers stamp past them.

    Read-your-own-writes: inside an open transaction the writer's own
    staged watermarks merge into the visibility it reads, so a verb can
    resolve state it created earlier in the same transaction (mkdir -p
    creating a chain of components) while other readers still see the
    pre-transaction state.
    """

    def __init__(self, root: str, backend: CommitBackend | None = None):
        self.root = root
        self.backend = backend if backend is not None else backend_from_env()
        self.tables: dict[str, VersionedTable] = {}
        self._staged: dict[str, int] | None = None
        self._touched: set[str] = set()
        self._pruned: dict[str, list[list[int]]] = {}
        self._fence_after_acquire = False

    @property
    def commits_path(self) -> str:
        return os.path.join(self.root, "_txn")

    def enroll(self, table: VersionedTable) -> VersionedTable:
        self.tables[table.spec.name] = table
        table.txn = self
        return table

    @property
    def active(self) -> bool:
        return self._staged is not None

    # -- manifest ----------------------------------------------------------

    def last_commit_id(self) -> int:
        ids = [
            int(f.split(".", 1)[0])
            for f in self.backend.list(self.commits_path)
            if f.endswith(".commit")
        ]
        return max(ids, default=0)

    def latest(self) -> dict:
        cid = self.last_commit_id()
        if cid == 0:
            return {"tables": {}}
        raw = self.backend.read(
            os.path.join(self.commits_path, f"{cid}.commit")
        )
        if raw is None:
            return {"tables": {}}
        try:
            return json.loads(raw)
        except ValueError:
            return {"tables": {}}

    def table_meta(self, name: str) -> dict | None:
        m = self.latest()["tables"].get(name)
        if self.active and name in self._staged:
            m = dict(m) if m else {"visible_through": 0, "aborted": []}
            m["visible_through"] = max(
                int(m.get("visible_through", 0)), self._staged[name]
            )
        return m

    # -- in-transaction staging -------------------------------------------

    def stage(self, table: VersionedTable, vt_new: int) -> None:
        if not self.active:
            raise RuntimeError("stage() outside an open transaction")
        name = table.spec.name
        self._touched.add(name)
        self._staged[name] = max(self._staged.get(name, 0), int(vt_new))

    def touch(self, table: VersionedTable) -> None:
        self._touched.add(table.spec.name)

    def stage_fence_prune(
        self, name: str, ranges: list[list[int]]
    ) -> None:
        """Stage retired fence ranges (rows already physically deleted
        by the table's fold — see ``VersionedTable._prune_fences``) for
        removal from the manifest at this transaction's commit."""
        if not self.active:
            raise RuntimeError("stage_fence_prune() outside an open transaction")
        self._pruned.setdefault(name, []).extend(list(r) for r in ranges)

    # -- lock + commit protocol -------------------------------------------

    def _reserve(self, cid: int) -> str | None:
        lock = os.path.join(self.commits_path, f"{cid}.lock")
        payload = f"pid={os.getpid()} ts={time.time()}\n".encode()
        if self.backend.put_if_absent(lock, payload):
            return lock
        mt = self.backend.mtime(lock)
        if mt is not None and time.time() - mt > LOCK_TTL_SEC:
            # steal a crashed writer's expired lease; the dead writer
            # may have appended to ANY enrolled table without
            # publishing — fence all tails under the next reservation
            self.backend.delete(lock)
            self._fence_after_acquire = True
        return None

    def _commit(
        self,
        lock: str,
        cid: int,
        staged: dict[str, int],
        fence_names: set[str],
        pruned: dict[str, list[list[int]]] | None = None,
    ) -> None:
        """Publish the cumulative manifest as ``<cid>.commit`` (atomic
        replace — readers see nothing or the full content), then
        release the lock.  ``pruned`` removes retired fence ranges
        whose rows the committing fold already physically deleted."""
        manifest = self.latest()
        tables = manifest.setdefault("tables", {})
        for name in sorted(fence_names):
            t = self.tables.get(name)
            if t is None:
                continue
            try:
                rng = t._orphan_range()
            except Exception:
                rng = None
            if rng:
                e = tables.setdefault(name, {"visible_through": 0, "aborted": []})
                e.setdefault("aborted", []).append(list(rng))
        for name, vt in staged.items():
            e = tables.setdefault(name, {"visible_through": 0, "aborted": []})
            e["visible_through"] = max(int(e.get("visible_through", 0)), vt)
        for name, ranges in (pruned or {}).items():
            e = tables.get(name)
            if not e:
                continue
            drop = [list(r) for r in ranges]
            e["aborted"] = [
                r for r in e.get("aborted", []) if list(r) not in drop
            ]
        self.backend.replace(
            os.path.join(self.commits_path, f"{cid}.commit"),
            json.dumps(manifest).encode(),
        )
        self.backend.delete(lock)

    def transaction(self):
        """Context manager: one atomic multi-table commit scope."""
        return _Transaction(self)


class _Transaction:
    def __init__(self, log: TransactionLog):
        self.log = log
        self._lock: str | None = None
        self._cid = 0

    def __enter__(self) -> TransactionLog:
        log = self.log
        if log.active:
            raise RuntimeError("transactions do not nest")
        for attempt in range(_MAX_COMMIT_RETRIES):
            nxt = log.last_commit_id() + 1
            lock = log._reserve(nxt)
            if lock is None:
                time.sleep(min(0.05 * (attempt + 1), 1.0))
                continue
            if log._fence_after_acquire:
                # burn this commit id on a fence-only manifest covering
                # every enrolled table, then reserve a fresh one
                log._fence_after_acquire = False
                log._commit(lock, nxt, {}, set(log.tables))
                continue
            self._lock, self._cid = lock, nxt
            log._staged, log._touched, log._pruned = {}, set(), {}
            return log
        raise WriteConflictError(
            f"could not reserve txn commit after {_MAX_COMMIT_RETRIES} attempts"
        )

    def __exit__(self, exc_type, exc, tb) -> bool:
        log = self.log
        staged, touched = log._staged or {}, log._touched
        pruned = log._pruned
        log._staged, log._touched, log._pruned = None, set(), {}
        if exc_type is None:
            log._commit(self._lock, self._cid, staged, set(), pruned)
        else:
            # failed verb: publish NOTHING; fence every touched table's
            # appended tail in a fence-only commit (still holding the
            # lock, so the probe is serialized)
            try:
                log._commit(self._lock, self._cid, {}, touched | set(staged))
            except Exception:
                log.backend.delete(self._lock)
        return False
