"""Declared query suite — every SURVEY §2 operator (plus the pipeline
extensions) bound to the driver's fixture tables, each with a DuckDB
oracle SQL string for differential correctness.

Registry model: ``QUERIES`` maps name → (fn, oracle_sql | None).
``fn(spark, sf_dir) -> DataFrame``.  Queries without an oracle are
genuinely non-SQL-expressible (or engine-specific approximations like
LSH bucketing); the driver records a rows-only check for those.

Determinism conventions (SURVEY §7 hard-part c):
- every LIMIT/OFFSET query orders by a unique key first;
- money aggregates go through DECIMAL(18,2) (exact, order-insensitive)
  and are cast back to DOUBLE for the comparator;
- dates/timestamps in outputs are formatted to strings;
- float similarity scores are computed in double precision with a
  deterministic left-to-right fold in both engines, rounded to 5dp.

Column-role binding onto the TPC-H-ish fixtures follows FIXTURES.md §6
(e.g. block.fileId→file.id ≡ lineitem.l_orderkey→orders.o_orderkey).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from adfs_spark.catalog import load_table
from adfs_spark.functions import similarity as sim
from adfs_spark.functions import text as textf
from adfs_spark.functions.dedup import (
    connected_components,
    exact_duplicates,
    jaccard_pairs,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from adfs_spark.operators.aggregates import group_argmax, max_version, under_replicated
from adfs_spark.operators.delta import changelog_of, merge_last_writer_wins, version_range
from adfs_spark.operators.find import Comparator, indexed_find, live_view, paginate
from adfs_spark.operators.hierarchy import descendants, path_column
from adfs_spark.operators.joins import anti_join, chain_join, fk_join, semi_join
from adfs_spark.operators.windows import argmax_rows, priority_bucket, top_k

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, tuple[QueryFn, str | None]] = {}

# q5's early-dim-restriction crossover: the two extra broadcast stages
# cost a fixed ~0.3 s, a loss while the whole fact-fact shuffle is a
# few MB (sf0.1 lineitem = 11 MB on disk) and a −44% win from sf10 up
# (110 MB at sf1 already wins).  64 MB sits between the measured loss
# and the measured win.
Q5_EARLY_RESTRICT_MIN_BYTES = 64 << 20

# q5 supplier-first gate: force-broadcast the region-filtered supplier
# slice onto lineitem BEFORE the l_orderkey exchange only while the
# whole supplier table is provably broadcast-sized.  128 MB of parquet
# is ~10M suppliers; the two-column slice builds a <300 MB hash
# relation — far under the 8 GB broadcast cap, but past this the plan
# must fall back to letting AQE place supplier after the fact join
# (a forced broadcast of an unbounded table OOMs executors).
Q5_SUPPLIER_BROADCAST_MAX_BYTES = 128 << 20


def _table_disk_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk footprint of a fixture table — the table statistic a
    CBO would read before ordering a join chain.  Works for single
    parquet files and directory tables; None for non-local storage
    (callers then default to the scale-safe plan)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(p):
            return os.path.getsize(p)
        total = 0
        for root, _, files in os.walk(p):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total if total > 0 else None
    except OSError:
        return None


_TMP_ROOTS: list[str] = []


def _tmp_root(prefix: str) -> str:
    """A tempdir for queries that materialize a VersionedTable, removed
    at interpreter exit.  Cleanup must be deferred — the returned
    DataFrames read these files lazily (the driver collects them after
    the query function returns) — but without it every correctness /
    bench invocation leaks a full table (data + changelog) in /tmp."""
    import atexit
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix=prefix)
    if not _TMP_ROOTS:
        atexit.register(
            lambda: [shutil.rmtree(r, ignore_errors=True) for r in _TMP_ROOTS]
        )
    _TMP_ROOTS.append(root)
    return root


_PERSISTED: list = []


def _persist_tracked(df):
    """``persist()`` + register for :func:`release_cached` — query
    functions that cache an intermediate register it here so repeated
    bench passes don't stack resident copies until LRU eviction."""
    _PERSISTED.append(df.persist())
    return _PERSISTED[-1]


def release_cached() -> None:
    """Unpersist every intermediate registered by query functions.
    Call after the caller has materialized the returned DataFrame
    (bench.py calls this between passes)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def q(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _dec4(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


#: size gate for the scaled-long money-sum route (r9, guide §2.3
#: "narrower types"): SUM(CAST(x AS DECIMAL(18,s)))::DOUBLE is the
#: oracle form, but the per-row double→BigDecimal cast plus the
#: decimal sum buffer cost ~2 µs/row under ANSI — 3.9× the whole q1
#: aggregation (measured at sf0.1: 0.855 s decimal vs 0.222 s long;
#: at sf100 q1 is ~100% aggregation-bound at 41.9 s warm).  The long
#: route sums round(x·10^s) as a primitive 8-byte long and converts
#: ONCE per group via an exact decimal division.  Overflow bound: the
#: worst single group is a global aggregate over the whole table —
#: rows × max(x·10^4) < 2^63 needs rows ≲ 8.4e9 (max revenue item
#: ≈ 1.1e9 at scale 10^4), i.e. lineitem ≲ sf1400.  The gate trips to
#: the decimal form at 64 GiB on-disk (≈ sf600, 2.3× margin); above
#: it ANSI long-sum overflow would RAISE, never wrap, so the route is
#: loud even if the gate is mis-sized.  Both forms are pinned equal by
#: tests/test_longsum.py and every converted query stays green against
#: its DuckDB oracle (selfcheck at sf0.001/0.01/0.1).
MONEY_LONGSUM_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_LONGSUM_MAX_BYTES", str(64 << 30))
)


def _fits_longsum(sf_dir: str, table: str = "lineitem") -> "bool | str":
    """Route the money-sum form by table size: ``True`` (plain
    scaled-long sum) under :data:`MONEY_LONGSUM_MAX_BYTES`, ``"wide"``
    (r10: the same exact per-row scaled long, accumulated in decimal —
    see :func:`_lsum_wide`) above it, ``False`` (the oracle decimal
    form) when the size is unknown.  Both truthy routes require the
    caller-vouched preconditions of :func:`_lsum` (non-negative exact
    2/4-decimal inputs); sites that branch on the result must
    distinguish ``True`` from ``"wide"`` — only the plain-long form
    has the per-group overflow exposure the gate bounds."""
    sz = _table_disk_bytes(sf_dir, table)
    if sz is None:
        return False
    return True if sz < MONEY_LONGSUM_MAX_BYTES else "wide"


def _lraw(c: str | Column, scale: int = 100) -> Column:
    """The per-row scaled-long term of :func:`_lsum` (callers that
    filter on the raw scaled sum before converting use it directly)."""
    col = F.col(c) if isinstance(c, str) else c
    return (col * scale + F.lit(0.5)).cast("long")


def _lfin(c: str | Column, alias: str, scale: int = 100) -> Column:
    """Final conversion of a scaled-long sum back to the oracle's
    double: exact decimal division, then the same correctly-rounded
    double cast the decimal route produces."""
    col = F.col(c) if isinstance(c, str) else c
    return (col.cast("decimal(38,0)") / scale).cast("double").alias(alias)


def _lsum_wide(c: str | Column, alias: str, scale: int = 100) -> Column:
    """Above-the-gate money sum (r10, lifts the 64 GiB longsum gate):
    the per-row term is the SAME exact scaled long as :func:`_lsum`
    (cheap double→long, no per-row BigDecimal rounding), but it is
    accumulated as DECIMAL(20,0) — the sum buffer is DECIMAL(30,0),
    whose headroom (1e30 of scaled cents ≈ 9e20 rows at the max 4-dp
    cent value) outlasts any realizable table, and ANSI decimal
    overflow RAISES rather than wraps even past that.  Each decimal
    term is integral and created from a long, so Spark keeps it in the
    compact-long representation; the expensive part of the decimal
    route — HALF_UP rounding of a double into a BigDecimal per row —
    never happens.  Final conversion is the same exact decimal divide
    as :func:`_lfin`, so the value is bit-identical to both other
    routes (pinned by tests/test_longsum.py)."""
    return _lfin(F.sum(_lraw(c, scale).cast("decimal(20,0)")), alias, scale)


def _lsum(c: str | Column, alias: str, scale: int = 100) -> Column:
    """Exact scaled-long form of ``SUM(CAST(x AS DECIMAL))::DOUBLE``.

    Per row: ``(x·scale + 0.5)::LONG`` — for NON-NEGATIVE x whose
    true value is an exact ``1/scale``-decimal (both verified on the
    fixtures: max |x·scale − round(x·scale)| ≤ 1e-9, min ≥ 0, and for
    the dec4 product sums the product of two 2-decimal rationals is an
    exact 4-decimal rational), truncation after +0.5 recovers exactly
    the integer HALF_UP would, so the long sum is the decimal sum
    ×scale.  The final ``/scale`` runs in decimal (exact for any
    long), and the cast to double is then the same correctly-rounded
    value the decimal route produces.  NULLs skip the sum and an empty
    group yields NULL — identical to the decimal form."""
    return _lfin(F.sum(_lraw(c, scale)), alias, scale)


def _dsum(c: str | Column, alias: str, longsum: "bool | str" = False) -> Column:
    """``SUM(CAST(x AS DECIMAL(18,2)))::DOUBLE`` — routed: the decimal
    form (always correct), the exact scaled-long form under the size
    gate (``longsum=True``; see :func:`_lsum`), or the scaled-long
    terms with decimal accumulation above it (``longsum="wide"``;
    see :func:`_lsum_wide`).  Callers pass
    ``longsum=_fits_longsum(sf_dir)``."""
    if longsum is True:
        return _lsum(c, alias, scale=100)
    if longsum == "wide":
        return _lsum_wide(c, alias, scale=100)
    return F.sum(_dec(c)).cast("double").alias(alias)


def _dsum4(c: str | Column, alias: str, longsum: "bool | str" = False) -> Column:
    """``SUM(CAST(expr AS DECIMAL(18,4)))::DOUBLE`` with the same
    routing as :func:`_dsum` at scale 10^4 (the revenue-product form)."""
    if longsum is True:
        return _lsum(c, alias, scale=10000)
    if longsum == "wide":
        return _lsum_wide(c, alias, scale=10000)
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(_dec4(col)).cast("double").alias(alias)


def _day(c: str) -> Column:
    return F.date_format(F.col(c), "yyyy-MM-dd")


def _version_col() -> Column:
    """Deterministic derived version for the tombstone/delta fixtures:
    abs(version) = o_orderkey + 1, negative for every 97th key."""
    v = (F.col("o_orderkey") + 1).cast("long")
    return F.when(F.col("o_orderkey") % 97 == 0, -v).otherwise(v)

_VERSION_SQL = "CASE WHEN o_orderkey % 97 = 0 THEN -(o_orderkey + 1) ELSE o_orderkey + 1 END"


# =========================================================================
# §2.1/2.2 — scans, indexed find, predicates (S1-S5, P1-P8)
# =========================================================================


@q(
    "s1_point_lookup",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
              strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority
       FROM orders WHERE o_orderkey = 500""",
)
def s1_point_lookup(spark, sf_dir):
    """S1 EQ point read on the pk index (findByKeys :472-479)."""
    o = load_table(spark, sf_dir, "orders")
    return indexed_find(o, ["o_orderkey"], [500]).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        _day("o_orderdate").alias("o_orderdate_s"), "o_orderpriority",
    )


@q(
    "s3_point_lookup_bucketed",
    """SELECT k, CAST(v AS DOUBLE) AS v FROM (
         SELECT o_orderkey AS k,
                CAST(o_totalprice AS DECIMAL(18,2)) AS v
         FROM orders WHERE o_orderkey % 10 = 0)
       WHERE k IN (500, 1000, 77770, 123450)""",
)
def s3_point_lookup_bucketed(spark, sf_dir):
    """S3, the HandlerSocket point-read path with PHYSICAL pruning:
    the table is materialized in the bucketed VersionedTable layout and
    ``point_lookup`` computes each key's pk-hash bucket on a keys-sized
    frame, filtering the scan on the ``_kb`` PARTITION column — a point
    read touches O(|keys|/num_buckets) of the files, the engine's
    analog of the executor's B-tree descent
    (DatabaseExecutorForHandlerSocket.findInternal :120-132).  Pruning
    is plan-asserted in test_point_lookup_bucketed_prunes_partitions;
    this row value-checks the read against a plain relational IN."""
    from adfs_spark.storage import VersionedTable

    spec = _kv_spec()
    root = _tmp_root("adfs_pl_")
    t = VersionedTable(spark, spec, os.path.join(root, "t"), num_buckets=16)
    t.init(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            _dec("o_totalprice").cast("double").alias("v"),
        )
    )
    return t.point_lookup([500, 1000, 77770, 123450]).select("k", "v")


@q(
    "s1_range_limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey >= 100
       ORDER BY o_orderkey LIMIT 50 OFFSET 20""",
)
def s1_range_limit_offset(spark, sf_dir):
    """S1 GE range scan with LIMIT offset,n (DatabaseExecutorForMysqlClient :98)."""
    o = load_table(spark, sf_dir, "orders")
    return indexed_find(
        o, ["o_orderkey"], [100], cmp=Comparator.GE, limit=50, offset=20
    ).select("o_orderkey", "o_totalprice")


@q(
    "s1_composite_prefix",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey = 42",
)
def s1_composite_prefix(spark, sf_dir):
    """P2: 1-key prefix probe of the composite (l_orderkey, l_linenumber)
    'index' (FileRepository.findByParentId :73-78)."""
    li = load_table(spark, sf_dir, "lineitem")
    return indexed_find(li, ["l_orderkey", "l_linenumber"], [42]).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@q(
    "s1_composite_point",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem WHERE l_orderkey = 42 AND l_linenumber = 3""",
)
def s1_composite_point(spark, sf_dir):
    """P2: full composite-key point read (findByParentIdAndName :67-71)."""
    li = load_table(spark, sf_dir, "lineitem")
    return indexed_find(li, ["l_orderkey", "l_linenumber"], [42, 3]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@q(
    "p4_in_filter",
    """SELECT o_orderkey, o_orderstatus FROM orders
       WHERE o_orderstatus IN ('P', 'F') AND o_totalprice >= 400000""",
)
def p4_in_filter(spark, sf_dir):
    """P4: IN comparator (TDHSCommon.FindFlag :51-64) + conjunct."""
    o = load_table(spark, sf_dir, "orders")
    return (
        indexed_find(o, ["o_orderstatus"], [["P", "F"]], cmp=Comparator.IN)
        .filter(F.col("o_totalprice") >= 400000)
        .select("o_orderkey", "o_orderstatus")
    )


@q(
    "p5_tombstone_filter",
    f"""SELECT o_orderkey, version FROM
        (SELECT o_orderkey, {_VERSION_SQL} AS version FROM orders)
        WHERE version >= 0""",
)
def p5_tombstone_filter(spark, sf_dir):
    """P5: live view strips version<0 (removeDeletedRows :481-488)."""
    o = load_table(spark, sf_dir, "orders").withColumn("version", _version_col())
    return live_view(o).select("o_orderkey", "version")


@q("s9_count", "SELECT count(*) AS cnt FROM lineitem")
def s9_count(spark, sf_dir):
    """S9/A1: COUNT(*) (DatabaseExecutor.count :139-155)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count("*").alias("cnt"))


@q(
    "s6_pagination_keyset",
    """SELECT n_nationkey, n_name FROM nation WHERE n_name > 'NATION_10'
       ORDER BY n_name LIMIT 5""",
)
def s6_pagination_keyset(spark, sf_dir):
    """§2.6: proper keyset listing pagination (the fork drops its
    startAfter parameter, FSNamesystem.getListing :1658-1661)."""
    n = load_table(spark, sf_dir, "nation")
    return paginate(n, ["n_name"], start_after="NATION_10", limit=5).select(
        "n_nationkey", "n_name"
    )


# =========================================================================
# §2.3 — joins (J1-J8)
# =========================================================================


@q(
    "j1_fact_join",
    """SELECT l_orderkey, l_linenumber, o_custkey, l_quantity
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderstatus = 'F'""",
)
def j1_fact_join(spark, sf_dir):
    """J1: file⋈block ≡ orders⋈lineitem 1→N equi join
    (findBlockByFilePath :800-808)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return fk_join(li, o, "l_orderkey", "o_orderkey").select(
        "l_orderkey", "l_linenumber", "o_custkey", "l_quantity"
    )


@q(
    "j2_dim_broadcast",
    """SELECT c_custkey, n_name, r_name FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey""",
)
def j2_dim_broadcast(spark, sf_dir):
    """J2: block⋈datanode ≡ fact⋈broadcast dims (in-memory map analog
    O12, reloadDatanodeDescriptorMaps :336-373)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    out = fk_join(c, n, "c_nationkey", "n_nationkey", broadcast_parent=True)
    out = fk_join(out, r, "n_regionkey", "r_regionkey", broadcast_parent=True)
    return out.select("c_custkey", "n_name", "r_name")


@q(
    "j3_semi_join",
    """SELECT o_orderkey FROM orders o WHERE EXISTS
       (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""",
)
def j3_semi_join(spark, sf_dir):
    """J3: loop-of-lookups driver ≡ semi join (findBlockByFiles :810-818)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return semi_join(o, li, o["o_orderkey"] == li["l_orderkey"]).select("o_orderkey")


@q(
    "j5_anti_reported",
    """SELECT event_id FROM events e WHERE NOT EXISTS
       (SELECT 1 FROM orders o WHERE o.o_orderkey = e.event_id)""",
)
def j5_anti_reported(spark, sf_dir):
    """J5 direction 1: reported ∖ stored (processReport toInvalidate
    :2488-2493)."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    return anti_join(e, o, e["event_id"] == o["o_orderkey"]).select("event_id")


@q(
    "j5_anti_stored",
    """SELECT o_orderkey FROM orders o WHERE NOT EXISTS
       (SELECT 1 FROM events e WHERE e.event_id = o.o_orderkey)""",
)
def j5_anti_stored(spark, sf_dir):
    """J5 direction 2: stored ∖ reported (toRemove leftover scan
    :2562-2577)."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    return anti_join(o, e, e["event_id"] == o["o_orderkey"]).select("o_orderkey")


@q(
    "j_skew_split",
    """SELECT o_orderkey, o_custkey, c_name
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE o_totalprice > 150000""",
)
def j_skew_split(spark, sf_dir):
    """Skew-aware split-union join (operators/skew.py): hot probe keys
    detected by sampling, routed through a broadcast slice of the
    build side; the long tail takes the ordinary shuffle join.  The
    oracle is the PLAIN join — the operator is a pure physical
    rewrite, so the driver row proves the split+union reconstructs it
    exactly (the 100 TB shape AQE can't reach: stream-static joins and
    pre-shuffle hot-partition routing)."""
    from adfs_spark.operators.skew import skew_split_join

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return skew_split_join(o, c, ["o_custkey"], min_frac=0.005).select(
        "o_orderkey", "o_custkey", "c_name"
    )


@q(
    "j_skew_replicated",
    """SELECT o_orderkey, o_custkey, c_name
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE o_orderpriority = '1-URGENT'""",
)
def j_skew_replicated(spark, sf_dir):
    """Salt-and-replicate skew join (operators/skew.py
    replicated_skew_join): the tier above j_skew_split for hot keys
    whose build slice is too large to broadcast — hot left rows get a
    salt, the hot right slice replicates once per salt value, the hot
    join shuffles on (key, salt).  Oracle = the PLAIN join; the driver
    row proves the salted reconstruction is exact."""
    from adfs_spark.operators.skew import replicated_skew_join

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return replicated_skew_join(
        o, c, ["o_custkey"], min_frac=0.005, salt=8
    ).select("o_orderkey", "o_custkey", "c_name")


@q(
    "j6_secondary_index_join",
    "SELECT s_suppkey, s_name, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey",
)
def j6_secondary_index_join(spark, sf_dir):
    """J6: lease⋈file-on-leaseHolder ≡ N→1 join on a secondary index
    (LeaseMonitor.run :893-914)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return fk_join(s, n, "s_nationkey", "n_nationkey", broadcast_parent=True).select(
        "s_suppkey", "s_name", "n_name"
    )


# =========================================================================
# §2.4/2.5 — aggregations + windows (A1-A7, W1-W4)
# =========================================================================


@q(
    "a2_group_argmax",
    """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS last_shipdate
       FROM (SELECT l_orderkey, l_linenumber, l_shipdate, row_number() OVER
               (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
             FROM lineitem) WHERE rn = 1""",
)
def a2_group_argmax(spark, sf_dir):
    """A2/W1: BlockEntry primary-replica argmax(generationStamp, version)
    ≡ argmax(l_shipdate, l_linenumber) per order (BlockEntry.java:42-63).
    Uses the packed-long argmax (the two order columns encode into one
    comparable long, so the agg is a primitive max over 8-byte shuffle
    rows — the struct max_by general form lives in group_argmax)."""
    from adfs_spark.operators.aggregates import group_argmax_packed

    li = load_table(spark, sf_dir, "lineitem")
    won = group_argmax_packed(li, ["l_orderkey"], "l_shipdate", "l_linenumber")
    return won.select(
        "l_orderkey", "l_linenumber", _day("l_shipdate").alias("last_shipdate")
    )


@q(
    "a3_sum_per_parent",
    """SELECT l_orderkey,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              count(*) AS n_items
       FROM lineitem GROUP BY l_orderkey""",
)
def a3_sum_per_parent(spark, sf_dir):
    """A3: SUM(block length) per file ≡ SUM per order
    (BlockEntry.getTotalLength :158-164)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        _dsum("l_extendedprice", "sum_price", longsum=_fits_longsum(sf_dir)),
        F.count("*").alias("n_items"),
    )


@q(
    "a4_status_summary",
    """SELECT o_orderstatus, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
       FROM orders GROUP BY o_orderstatus""",
)
def a4_status_summary(spark, sf_dir):
    """A4: content-summary-style count/sum buckets
    (FSNamesystem.getContentSummary :1462-1473)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        _dsum("o_totalprice", "sum_price", longsum=_fits_longsum(sf_dir, "orders")),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
    )


@q(
    "a5_global_stats",
    """SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              count(*) AS n_rows, count(DISTINCT l_partkey) AS n_parts,
              round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) AS avg_price
       FROM lineitem""",
)
def a5_global_stats(spark, sf_dir):
    """A5: cluster statistics SUM/COUNT battery
    (updateClusterStatistics :478-512)."""
    li = load_table(spark, sf_dir, "lineitem")
    lf = _fits_longsum(sf_dir)
    sum_price = _dsum("l_extendedprice", "_sp", longsum=lf)
    return li.agg(
        _dsum("l_quantity", "sum_qty", longsum=lf),
        F.count("*").alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        sum_price,
    ).select(
        "sum_qty",
        "n_rows",
        "n_parts",
        F.round(F.col("_sp") / F.col("n_rows"), 2).alias("avg_price"),
    )


@q(
    "a6_having_under_threshold",
    """SELECT o_orderkey, count(*) AS n_items FROM orders
       JOIN lineitem ON l_orderkey = o_orderkey
       GROUP BY o_orderkey HAVING count(*) < 2""",
)
def a6_having_under_threshold(spark, sf_dir):
    """A6: blocks with live replicas < replication factor ≡ orders with
    fewer items than a threshold (checkReplicationFactor :1140-1150)."""
    o = load_table(spark, sf_dir, "orders").withColumn("expected", F.lit(2))
    li = load_table(spark, sf_dir, "lineitem")
    return under_replicated(li, o, "l_orderkey", "o_orderkey", "expected").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("live_count").alias("n_items")
    )


@q(
    "a7_max_version",
    f"SELECT max(abs(version)) AS max_version FROM (SELECT {_VERSION_SQL} AS version FROM orders)",
)
def a7_max_version(spark, sf_dir):
    """A7: version-counter discovery (findVersionFromData :168-189)."""
    o = load_table(spark, sf_dir, "orders").withColumn("version", _version_col())
    return max_version(o)


@q(
    "a8_observe_counters",
    f"""SELECT count(*) AS n_rows,
              sum(CASE WHEN version >= 0 THEN 1 ELSE 0 END) AS n_live,
              sum(CASE WHEN version < 0 THEN 1 ELSE 0 END) AS n_tombstone
       FROM (SELECT {_VERSION_SQL} AS version FROM orders)""",
)
def a8_observe_counters(spark, sf_dir):
    """A8: per-operation counters via ``Dataset.observe``
    (metrics.observed) — the Spark-native analog of the reference's
    AtomicLong op counters (DatabaseExecutor.getCounter/count
    :139-155), driver-verified against the oracle's direct counts.

    The counters piggyback on the scan's own action (zero extra
    passes); the query then RETURNS them as a one-row frame so the
    driver's hash compare pins the observed values — not a re-count —
    against DuckDB."""
    from adfs_spark.metrics import collect_metrics, observed

    o = load_table(spark, sf_dir, "orders").withColumn(
        "version", _version_col()
    )
    odf, obs = observed(o, name="a8_counters", version_col="version")
    odf.write.format("noop").mode("overwrite").save()
    m = collect_metrics(obs)
    return spark.createDataFrame(
        [(int(m["n_rows"]), int(m["n_live"]), int(m["n_tombstone"]))],
        "n_rows: long, n_live: long, n_tombstone: long",
    )


@q(
    "w1_argmax_window",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
       FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             FROM lineitem) WHERE rn = 1""",
)
def w1_argmax_window(spark, sf_dir):
    """W1 window form: best row per supplier (row_number()==1)."""
    li = load_table(spark, sf_dir, "lineitem")
    return argmax_rows(
        li,
        ["l_suppkey"],
        [F.desc("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
    ).select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")


@q(
    "w2_topk_per_group",
    """SELECT l_orderkey, l_linenumber, rn AS rank FROM
       (SELECT l_orderkey, l_linenumber, row_number() OVER
          (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 2""",
)
def w2_topk_per_group(spark, sf_dir):
    """W2 generalization: top-k rows per group (ordinal ordering of
    blocks within a file, BlockEntry.compareTo :119-122).

    Routed through operators.skew.topk_per_group: the plain window
    below SALTED_TOPK_MIN_BYTES, the funnel-free salted two-phase form
    on probed-hot inputs, and past SMALLK_TOPK_MIN_BYTES the
    partial-aggregating small-k form (r8 ask #3) — here with the order
    packed into one comparable long (quantity is a 2-decimal value
    ≤ 10k, linenumber < 2^20, both non-null), so the top rung
    aggregates 8-byte codes instead of window-sorting every input row
    (43 s vs 116 s at 600M rows).  Identical output on every route
    (w_topk_salted pins salted; test_skew pins the small-k forms), so
    scale chooses the physical plan, not the caller."""
    from adfs_spark.operators.skew import topk_per_group

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    # floor-form scaled long (see _lraw): l_quantity ≥ 0 and exact
    # 2-decimal, so +0.5/truncate ≡ round() without the per-row
    # BigDecimal the round() expression pays
    q100 = _lraw("l_quantity")
    enc = F.shiftleft(F.lit(1 << 20) - q100, 32) + F.col(
        "l_linenumber"
    ).cast("long")
    return topk_per_group(
        li,
        ["l_orderkey"],
        [F.desc("l_quantity"), "l_linenumber"],
        k=2,
        size_hint_bytes=_table_disk_bytes(sf_dir, "lineitem"),
        # TPC-H lineitem: ≤ 7 lines per order at every SF — the packed
        # form's buffer bound holds, so it routes at ANY size (r9)
        max_group_hint=7,
        order_spec=[("l_quantity", "desc"), ("l_linenumber", "asc")],
        packed_enc=enc,
        packed_decode=[
            (
                F.pmod(F.col("_packed"), F.lit(1 << 32)).cast("int"),
                "l_linenumber",
            )
        ],
    ).select("l_orderkey", "l_linenumber", "rank")


@q(
    "w_topk_salted",
    """SELECT l_orderkey, l_linenumber, rn AS rank FROM
       (SELECT l_orderkey, l_linenumber, row_number() OVER
          (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 2""",
)
def w_topk_salted(spark, sf_dir):
    """W2's semantics through the funnel-free two-phase salted window
    (operators/skew.py salted_topk): phase 1 keeps k per (key, salt)
    sub-partition, phase 2 ranks only the ≤ salt·k survivors — no
    single task ever sees a whole hot key.  Oracle = the plain window
    SQL, proving the rewrite is exact."""
    from adfs_spark.operators.skew import salted_topk

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return salted_topk(
        li, ["l_orderkey"], [F.desc("l_quantity"), "l_linenumber"], k=2, salt=8
    ).select("l_orderkey", "l_linenumber", "rank")


@q(
    "w3_priority_topk",
    """SELECT o_orderkey, priority FROM
       (SELECT o_orderkey, CASE WHEN o_orderpriority = '1-URGENT' THEN 0
                                WHEN o_orderpriority = '2-HIGH' THEN 1
                                ELSE 2 END AS priority FROM orders)
       ORDER BY priority, o_orderkey LIMIT 100""",
)
def w3_priority_topk(spark, sf_dir):
    """W3: priority-bucketed queue, top-100
    (UnderReplicatedBlocks.getPriority :70-107)."""
    o = load_table(spark, sf_dir, "orders")
    b = priority_bucket(
        o,
        [
            (F.col("o_orderpriority") == "1-URGENT", 0),
            (F.col("o_orderpriority") == "2-HIGH", 1),
        ],
        default=2,
    )
    return top_k(b, [F.col("priority"), F.col("o_orderkey")], 100).select(
        "o_orderkey", "priority"
    )


@q(
    "w4_pick_one_per_group",
    """SELECT c_nationkey, c_custkey, c_name FROM
       (SELECT c_nationkey, c_custkey, c_name, row_number() OVER
          (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn FROM customer)
       WHERE rn = 1""",
)
def w4_pick_one_per_group(spark, sf_dir):
    """W4: one datanode per ip ≡ one customer per nation, deterministic
    order (getDatanodeDescriptorByDatanodeIp :307-318)."""
    c = load_table(spark, sf_dir, "customer")
    return argmax_rows(c, ["c_nationkey"], [F.col("c_custkey")]).select(
        "c_nationkey", "c_custkey", "c_name"
    )


@q(
    "sort_topk_global",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def sort_topk_global(spark, sf_dir):
    """§2.6: global top-k (TakeOrderedAndProject — per-partition heaps,
    no full sort)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k(o, [F.desc("o_totalprice"), F.col("o_orderkey")], 10).select(
        "o_orderkey", "o_totalprice"
    )


# =========================================================================
# §2.7 — time-threshold scans (T1, T2)
# =========================================================================


@q(
    "t1_expired_threshold",
    "SELECT event_id FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'",
)
def t1_expired_threshold(spark, sf_dir):
    """T1: expired leases — time < now − hardLimit
    (LeaseRepository.findByTimeLessThan :48-52)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp")).select(
        "event_id"
    )


@q(
    "t2_stale_relative",
    """SELECT event_id FROM events
       WHERE ts < (SELECT max(ts) - INTERVAL 7 DAY FROM events)""",
)
def t2_stale_relative(spark, sf_dir):
    """T2: dead datanodes — lastUpdated < now − expireInterval, with
    'now' = max heartbeat (isDatanodeDead :1784-1786).  The scalar
    aggregate is broadcast-joined, not collected."""
    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg((F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("_cutoff"))
    return e.join(F.broadcast(cutoff)).filter(F.col("ts") < F.col("_cutoff")).select(
        "event_id"
    )


# =========================================================================
# §2.8 — hierarchy (H1-H6) on the region→nation→customer chain
# =========================================================================

_NS_SQL = """
    SELECT 1 + r_regionkey AS id, 0 AS parentId, r_name AS name FROM region
    UNION ALL
    SELECT 100 + n_nationkey, 1 + n_regionkey, n_name FROM nation
    UNION ALL
    SELECT 10000 + c_custkey, 100 + c_nationkey, c_name FROM customer
"""


def _namespace(spark, sf_dir) -> DataFrame:
    """Synthetic namespace tree: root(0) → regions → nations → customers,
    with disjoint id ranges (FIXTURES.md §6 hierarchy binding)."""
    r = load_table(spark, sf_dir, "region").select(
        (F.col("r_regionkey") + 1).cast("long").alias("id"),
        F.lit(0).cast("long").alias("parentId"),
        F.col("r_name").alias("name"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 100).cast("long").alias("id"),
        (F.col("n_regionkey") + 1).cast("long").alias("parentId"),
        F.col("n_name").alias("name"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") + 10000).cast("long").alias("id"),
        (F.col("c_nationkey") + 100).cast("long").alias("parentId"),
        F.col("c_name").alias("name"),
    )
    return r.unionByName(n).unionByName(c)


@q(
    "h1_chain_resolution",
    """SELECT c_custkey, concat('/', r_name, '/', n_name, '/', c_name) AS path
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey""",
)
def h1_chain_resolution(spark, sf_dir):
    """H1/J4: bounded-depth path chain — every customer's full path
    (findFilesByPath :681-694, batch form)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    chained = chain_join(
        [r, n, c], [("n_regionkey", "r_regionkey"), ("c_nationkey", "n_nationkey")]
    )
    return chained.select(
        "c_custkey",
        F.concat(
            F.lit("/"), F.col("r_name"), F.lit("/"), F.col("n_name"), F.lit("/"), F.col("c_name")
        ).alias("path"),
    )


@q(
    "h3_listing_children",
    """SELECT c_custkey, c_name FROM customer WHERE c_nationkey = 5
       AND c_name > 'Customer#000000100' ORDER BY c_name LIMIT 20""",
)
def h3_listing_children(spark, sf_dir):
    """H3 + keyset pagination: directory listing of one nation's
    customers (findFileChildrenByPath :701-720)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 5)
    return paginate(c, ["c_name"], start_after="Customer#000000100", limit=20).select(
        "c_custkey", "c_name"
    )


@q(
    "h4_descendants",
    f"""WITH ns AS ({_NS_SQL})
        SELECT a.id, a.name, 1 AS level FROM ns a WHERE a.parentId = 1
        UNION ALL
        SELECT b.id, b.name, 2 AS level FROM ns b
        WHERE b.parentId IN (SELECT id FROM ns WHERE parentId = 1)""",
)
def h4_descendants(spark, sf_dir):
    """H4: BFS descendant set of region node 1 (= 'AFRICA')
    (findFileDescendantByFileInternal :731-755)."""
    ns = _namespace(spark, sf_dir)
    return descendants(ns, [1]).select("id", "name", "level")


@q(
    "h2_path_column",
    f"""WITH ns AS ({_NS_SQL})
        SELECT n1.id, concat('/', coalesce(n3.name || '/', ''),
                             coalesce(n2.name || '/', ''), n1.name) AS path
        FROM ns n1
        LEFT JOIN ns n2 ON n1.parentId = n2.id
        LEFT JOIN ns n3 ON n2.parentId = n3.id""",
)
def h2_path_column(spark, sf_dir):
    """H2: reverse path reconstruction for every node, batch
    (findFileById :647-659 done set-at-a-time).  Uses the (id, path)
    form directly — no attach join back onto ns — and names the
    internal-node predicate (dirs are the id < 10000 rows in the
    fixture binding; length == -1 on a real FILE table), so the parent
    side is a map-side filter, not a parent-id distinct shuffle."""
    from adfs_spark.operators.hierarchy import path_strings

    ns = _namespace(spark, sf_dir)
    return path_strings(ns, internal_filter=F.col("id") < 10000).select("id", "path")


# =========================================================================
# §2.9/2.10 — write-path & delta (U1-U4, D1-D2) in pure query form
# =========================================================================


@q(
    "d2_delta_range",
    f"""SELECT o_orderkey, version FROM
        (SELECT o_orderkey, {_VERSION_SQL} AS version FROM orders)
        WHERE abs(version) BETWEEN 5000 AND 10000""",
)
def d2_delta_range(spark, sf_dir):
    """D2: version-range delta extraction (getDataIncrement :221-249)."""
    o = load_table(spark, sf_dir, "orders").withColumn("version", _version_col())
    return version_range(o, 5000, 10000).select("o_orderkey", "version")


@q(
    "u4_lww_merge",
    f"""WITH base AS (SELECT o_orderkey, {_VERSION_SQL} AS version,
                            CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
         upd AS (SELECT o_orderkey, o_orderkey + 1000001 AS version,
                        CAST(o_totalprice + 1000 AS DECIMAL(18,2)) AS price
                 FROM orders WHERE o_orderkey % 5 = 0),
         unioned AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
         SELECT o_orderkey, version, CAST(price AS DOUBLE) AS price FROM
           (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY abs(version) DESC) AS rn FROM unioned)
         WHERE rn = 1""",
)
def u4_lww_merge(spark, sf_dir):
    """U4: idempotent last-writer-wins merge by |version|
    (insert/update/deleteDirectly :420-470)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", _version_col().alias("version"), _dec("o_totalprice").alias("price")
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_orderkey") + 1000001).cast("long").alias("version"),
        _dec(F.col("o_totalprice") + 1000).alias("price"),
    )
    merged = merge_last_writer_wins(base, upd, ["o_orderkey"])
    return merged.select(
        "o_orderkey", "version", F.col("price").cast("double").alias("price")
    )


@q(
    "d1_changelog_classify",
    f"""WITH log AS (
          SELECT o_orderkey, {_VERSION_SQL} AS version FROM orders
          UNION ALL
          SELECT o_orderkey, o_orderkey + 1000001 FROM orders WHERE o_orderkey % 5 = 0)
        SELECT o_orderkey, version,
               CASE WHEN version < 0 THEN 'DELETE'
                    WHEN row_number() OVER (PARTITION BY o_orderkey
                         ORDER BY abs(version)) = 1 THEN 'INSERT'
                    ELSE 'UPDATE' END AS op
        FROM log""",
)
def d1_changelog_classify(spark, sf_dir):
    """D1: op classification of a change log
    (DistributedOperationQueue.java:21-103)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", _version_col().alias("version"))
    upd = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", (F.col("o_orderkey") + 1000001).cast("long").alias("version")
    )
    log = base.unionByName(upd)
    return changelog_of(log, ["o_orderkey"], op_col="op")


# =========================================================================
# §2.11 — scalar functions (F1-F7)
# =========================================================================


@q(
    "f2_ip_pack_roundtrip",
    """SELECT event_id, user_id,
              user_id * 4294967296 + event_id AS packed,
              (user_id * 4294967296 + event_id) // 4294967296 AS ip_back,
              (user_id * 4294967296 + event_id) % 4294967296 AS port_back
       FROM events WHERE event_id < 1000""",
)
def f2_ip_pack_roundtrip(spark, sf_dir):
    """F2: (ip,port)↔long packing (Datanode.getIp/getPort :166-172).
    Expressed with *arithmetic* (not bit ops) so the oracle SQL is
    engine-portable; the library's pack_ip_port uses shifts."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    packed = (F.col("user_id") * F.lit(4294967296).cast("long") + F.col("event_id")).cast("long")
    return e.select(
        "event_id",
        "user_id",
        packed.alias("packed"),
        F.floor(packed / 4294967296).cast("long").alias("ip_back"),
        F.pmod(packed, F.lit(4294967296)).cast("long").alias("port_back"),
    )


# =========================================================================
# Pipeline extensions: text analysis
# =========================================================================


@q(
    "text_token_count",
    """SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
       FROM documents""",
)
def text_token_count(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", textf.token_count(F.col("text")).alias("n_tokens"))


@q(
    "text_quality_ratios",
    """SELECT doc_id,
          round(CAST(len(list_filter(string_split(lower(text), ' '),
                x -> x IN ('the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','be')))
                AS DOUBLE) / greatest(len(list_filter(string_split(lower(text), ' '), x -> x <> '')), 1), 5)
            AS stopword_ratio,
          round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1), 5) AS punct_ratio
       FROM documents""",
)
def text_quality_ratios(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(textf.stopword_ratio(F.col("text")), 5).alias("stopword_ratio"),
        F.round(textf.punct_ratio(F.col("text")), 5).alias("punct_ratio"),
    )


@q(
    "text_lang_distribution",
    "SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY source, lang",
)
def text_lang_distribution(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(F.count("*").alias("n_docs"))


def _langid_oracle_sql() -> str:
    """Render the marker-count argmax as DuckDB SQL, generated from the
    same LANG_MARKERS profiles the engine uses.  Occurrence counting is
    (len - len_without_marker)/len(marker); the CASE order mirrors the
    engine's first-max-wins tie-break over dict insertion order."""
    score_exprs = []
    for lang, markers in textf.LANG_MARKERS.items():
        parts = [
            f"(length(t)-length(replace(t,'{m}','')))/{len(m)}" for m in markers
        ]
        score_exprs.append(f"({' + '.join(parts)}) AS {lang}")
    langs = list(textf.LANG_MARKERS)
    best = f"greatest({', '.join(langs)})"
    cases = " ".join(f"WHEN {l} = {best} THEN '{l}'" for l in langs)
    return f"""
WITH s AS (SELECT doc_id, lower(text) AS t FROM documents),
sc AS (SELECT doc_id, {', '.join(score_exprs)} FROM s)
SELECT doc_id, CASE WHEN {best} <= 0 THEN 'und' {cases} END AS lang_pred FROM sc
"""


@q(
    "text_tfidf_top_terms",
    """WITH toks AS (SELECT doc_id,
                            unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
                     FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (SELECT doc_id, term,
                              tf * ((n.n - dfc + 0.5) / (dfc + 0.5)) AS s
                       FROM tf JOIN dfreq USING (term), n),
            ranked AS (SELECT doc_id, term, s,
                              row_number() OVER (PARTITION BY doc_id
                                                 ORDER BY s DESC, term) AS rn
                       FROM scored)
       SELECT doc_id, term, round(s, 5) AS score, rn AS rank
       FROM ranked WHERE rn <= 3""",
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by tf·idf (rational idf
    — exact cross-engine arithmetic, see text.tf_idf_top_terms)."""
    d = load_table(spark, sf_dir, "documents")
    t = textf.tf_idf_top_terms(d, "doc_id", "text", k=3)
    return t.select("doc_id", "term", F.round("score", 5).alias("score"), "rank")


@q("text_langid_heuristic", _langid_oracle_sql())
def text_langid_heuristic(spark, sf_dir):
    """N-gram/marker language-ID heuristic (argmax of marker-hit
    scores; first language in profile order wins ties)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", textf.langid(F.col("text")).alias("lang_pred"))


@q("text_fingerprint_md5", "SELECT doc_id, md5(text) AS fingerprint FROM documents")
def text_fingerprint_md5(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", textf.md5_fingerprint(F.col("text")).alias("fingerprint"))


# =========================================================================
# Pipeline extensions: deduplication
# =========================================================================


@q(
    "dedup_exact_groups",
    """WITH docs AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
       )
       SELECT fingerprint, n_dups, keeper FROM
       (SELECT md5(text) AS fingerprint, count(*) AS n_dups, min(doc_id) AS keeper
        FROM docs GROUP BY 1) WHERE n_dups > 1""",
)
def dedup_exact_groups(spark, sf_dir):
    """Exact-dup groups via one md5-fingerprint groupBy.

    The synthetic corpus is duplicate-free (every text distinct), so
    the fixture check plants deterministic duplicates — every 10th doc
    re-inserted under a shifted id, mirrored in the oracle — to keep
    the dup-group path non-vacuous."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return exact_duplicates(d.unionAll(planted), "doc_id", "text")


@q(
    "dedup_repeated_spans",
    """WITH corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
         UNION ALL
         SELECT doc_id + 3000000,
                array_to_string(t[greatest(len(t)-19,1):len(t)], ' ')
         FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS t
               FROM documents)
         WHERE doc_id % 25 = 0
       ),
       toks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS t
                FROM corpus),
       sp AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS span_fp
              FROM toks, UNNEST(range(1, greatest(len(t)-8+1,1)+1)) r(i))
       SELECT span_fp, count(DISTINCT doc_id) AS n_docs,
              count(*) AS n_occurrences, min(doc_id) AS keeper
       FROM sp GROUP BY span_fp HAVING count(DISTINCT doc_id) >= 2""",
)
def dedup_repeated_spans(spark, sf_dir):
    """Substring-level dedup (dedup.repeated_spans): 8-token spans in
    ≥2 distinct docs.  The synthetic corpus is span-disjoint, so the
    fixture plants both contamination shapes: every 10th doc re-
    inserted whole (full-copy) and every 25th doc's LAST 20 tokens as
    a new short doc (partial-substring overlap — the case doc-level
    dedup misses and span-level catches)."""
    from adfs_spark.functions.dedup import repeated_spans

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    full = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    toks = textf.whitespace_tokens(F.col("text"))
    tail = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, F.greatest(F.size(toks) - 19, F.lit(1)), 20)
        ).alias("text"),
    )
    corpus = d.unionByName(full).unionByName(tail)
    return repeated_spans(corpus, "doc_id", "text", window=8, min_docs=2)


_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
  FROM toks, UNNEST(range(1, greatest(len(t)-2, 1)+1)) AS r(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(c*1.0/(sa.sz + sb.sz - c), 5) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE c*1.0/(sa.sz + sb.sz - c) >= 0.8
"""


@q("dedup_ngram_jaccard", _JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs at threshold 0.8."""
    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    return pairs.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


@q(
    "dedup_minhash_incremental",
    f"""SELECT id_a, id_b, jaccard FROM ({_JACCARD_SQL})
        WHERE id_a % 3 = 0 OR id_b % 3 = 0""",
)
def dedup_minhash_incremental(spark, sf_dir):
    """The incremental dedup path, value-checked end-to-end: the
    corpus (doc_id % 3 ≠ 0) is indexed once (minhash_index), then the
    'ingest batch' (doc_id % 3 = 0) dedups against it WITHOUT the
    corpus being re-shingled — and the result must equal the exact
    all-pairs Jaccard answer restricted to pairs touching a batch doc
    (same recall argument as dedup_minhash_lsh: banding recall 1.0 on
    the fixture, verify precision exact)."""
    from adfs_spark.functions.dedup import minhash_dedup_incremental, minhash_index

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    # Materialize the index to a parquet table between the two phases —
    # the deployment shape minhash_index documents ("write it once"),
    # and what flattens the probe plan: with a live index the batch
    # probe's tree contains the WHOLE corpus signature pipeline (417
    # exchanges at the sf0.001 dump), and the optimizer re-plans it per
    # consumer.  The write happens inside this invocation (it is timed;
    # nothing survives the call — fresh tmp dir per invocation), and
    # the index rows are identical, so the declared result is unchanged.
    import os as _os

    idx_dir = _os.path.join(_tmp_root("adfs_mhidx_"), "idx")
    minhash_index(corpus, "doc_id", "text").write.parquet(idx_dir)
    idx = spark.read.parquet(idx_dir)
    pairs = minhash_dedup_incremental(
        new, corpus, idx, "doc_id", "text", persisted_out=_PERSISTED
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


@q("dedup_minhash_lsh", _JACCARD_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pipeline.  Oracle = the exact all-pairs
    Jaccard SQL: the verify stage computes exact Jaccard on LSH
    candidates (perfect precision), and at 16 bands × 4 rows the
    banding recall at threshold 0.8 is ≥0.9998 per pair — deterministic
    under the fixed hash seed, and verified equal to the exact answer
    on the sf0.001/sf0.01 fixtures."""
    d = load_table(spark, sf_dir, "documents")
    # persisted_out=_PERSISTED: every frame the pipeline persists on
    # our behalf is registered for release_cached() — without it, a
    # repeated invocation (bench best-of-N) gets plan-identical
    # subtrees substituted from the PREVIOUS invocation's cache and
    # min-of-N partly measures a warm cache, not the plan (r9 verdict).
    got = minhash_near_duplicates(
        d, "doc_id", "text", num_hashes=64, num_bands=16, threshold=0.8,
        persisted_out=_PERSISTED,
    )
    return got.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


@q(
    "dedup_simhash",
    """WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         FROM documents),
       h AS (SELECT doc_id,
                    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
             FROM toks),
       votes AS (
         SELECT doc_id, i,
                sum(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
         FROM h, UNNEST(range(0, 60)) r(i)
         GROUP BY doc_id, i),
       sig AS (
         SELECT doc_id,
                sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                         ELSE 0 END) AS s
         FROM votes GROUP BY doc_id)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.s, b.s)) <= 12""",
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup candidates at hamming ≤ 12 of 60 bits.

    Upgraded from a rows-only check: the md5-derived bit hash is
    engine-portable, so DuckDB recomputes the exact signatures and the
    all-pairs hamming set.  The Spark side still runs the pigeonhole
    banding plan (15 chunks × 4 bits — candidate equi-join, no cross
    join); with max_hamming=12 < 15 chunks the banding recall is exactly
    1, so the bucketed answer provably equals the oracle's brute force.
    """
    d = load_table(spark, sf_dir, "documents")
    out = simhash_near_duplicates(
        d, "doc_id", "text", max_hamming=12, num_chunks=15,
        num_bits=60, hash_fn="md5_60",
    )
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


# =========================================================================
# Pipeline extensions: similarity search
# =========================================================================

_COS_SQL = """
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
           / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                    list_transform(embedding, x -> CAST(x AS DOUBLE))))
              * sqrt(list_dot_product(qv, qv))) AS sim
  FROM embeddings, q)
SELECT vec_id, round(sim, 5) AS sim FROM scored
ORDER BY sim DESC, vec_id LIMIT 10
"""


@q("sim_topk_bruteforce", _COS_SQL)
def sim_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-10 neighbors of vec_id 0 (brute force)."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    got = sim.brute_force_topk(e, qv, k=10)
    return got.select("vec_id", F.round("sim", 5).alias("sim"))


@q(
    "sim_topk_quantized",
    """WITH v AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                  FROM embeddings),
       sc AS (SELECT vec_id, e,
                     greatest(list_max(list_transform(e, x -> abs(x))), 1e-30)
                       / 127.0 AS s
              FROM v),
       cd AS (SELECT vec_id,
                     list_transform(e, x -> CAST(floor(x / s + 0.5) AS DOUBLE)) AS c
              FROM sc),
       q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
       sims AS (SELECT vec_id,
                       list_dot_product(c, qe)
                         / (sqrt(list_dot_product(c, c))
                            * sqrt(list_dot_product(qe, qe))) AS sim
                FROM cd, q)
       SELECT vec_id, round(sim, 5) AS sim
       FROM sims ORDER BY sim DESC, vec_id LIMIT 10""",
)
def sim_topk_quantized(spark, sf_dir):
    """Cosine top-10 over the int8-quantized corpus
    (similarity.quantize_int8 + quantized_brute_topk): the FAISS-SQ8
    storage tier — 4× smaller scan than float32, and because cosine is
    invariant to the per-vector scale the scan runs directly on the
    tinyint codes with no dequantize multiply.  The oracle recomputes
    the quantization arithmetic (explicit floor(x+0.5) rounding, tiny
    scale floor) and the code-space cosine relationally."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    got = sim.quantized_brute_topk(e, qv, k=10)
    return got.select("vec_id", F.round("sim", 5).alias("sim"))


# Deterministic md5-derived hyperplanes, regenerated identically in the
# oracle: sig bit b set iff ordered-fold dot(embedding, plane_b) >= 0.
_LSH_SIG_SQL = """
planes AS (
  SELECT b, d,
         CAST((('0x' || substring(md5('lsh_' || b || '_' || d), 1, 8))::BIGINT % 16) - 8
              AS DOUBLE) AS w
  FROM range(0, 8) t1(b), range(0, 64) t2(d)
),
plist AS (SELECT b, list(w ORDER BY d) AS p FROM planes GROUP BY b),
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
sig AS (
  SELECT vec_id,
         sum(CASE WHEN list_dot_product(v.e, plist.p) >= 0
                  THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS s
  FROM v, plist GROUP BY vec_id
)
"""


@q(
    "sim_topk_lsh",
    f"""WITH {_LSH_SIG_SQL},
       q AS (SELECT sig.s AS qs, v.e AS qe FROM sig JOIN v USING (vec_id)
             WHERE vec_id = 0),
       cand AS (SELECT v.vec_id, v.e, q.qe FROM v JOIN sig USING (vec_id), q
                WHERE bit_count(xor(sig.s, q.qs)) <= 2),
       scored AS (SELECT vec_id,
                         list_dot_product(e, qe)
                           / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qe, qe))) AS sim
                  FROM cand)
       SELECT vec_id, round(sim, 5) AS sim FROM scored
       ORDER BY sim DESC, vec_id LIMIT 10""",
)
def sim_topk_lsh(spark, sf_dir):
    """ANN top-10 via multi-probe hyperplane LSH: 8 bits / hamming ≤ 2
    probes 37/256 ≈ 14% of the corpus — the recall vs scan-fraction
    knob (recall floor pytest-checked against brute force).

    Oracle-checked: the md5-derived integer hyperplanes
    (DeterministicHyperplaneLSH) regenerate identically in SQL, so
    DuckDB recomputes the exact signatures, the same hamming ≤ 2
    candidate set, and the same exact-cosine ranking — the bucketed
    approximation itself is value-verified, not just row-counted."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    lsh = sim.DeterministicHyperplaneLSH(dim=64, num_bits=8, salt="lsh")
    bucketed = lsh.bucketize(e)
    got = lsh.topk(bucketed, qv, k=10, max_hamming=2)
    return got.select("vec_id", F.round("sim", 5).alias("sim"))


_NEARDUP_SQL = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 5) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.45
"""


@q("sim_embedding_neardup_exact", _NEARDUP_SQL)
def sim_embedding_neardup_exact(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs — the verify stage of
    embedding dedup, run exhaustively for the oracle.

    Threshold 0.45 is fixture-calibrated: the synthetic uniform
    embeddings have no true near-dups (all-pairs max cosine ≈ 0.51 at
    sf0.01), so a production-style 0.9+ cut returns an empty — hence
    vacuous — value check; 0.45 keeps ~14 verified rows."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(F.col("vec_id"), F.col("embedding"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        sim.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("sim"),
    )
    return pairs.filter(F.col("sim") >= 0.45).select(
        "id_a", "id_b", F.round("sim", 5).alias("sim")
    )


@q(
    "sim_embedding_neardup_lsh",
    f"""WITH {_LSH_SIG_SQL},
       vs AS (SELECT v.vec_id, v.e, sig.s FROM v JOIN sig USING (vec_id)),
       pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ea, b.e AS eb
                 FROM vs a JOIN vs b ON a.s = b.s AND a.vec_id < b.vec_id),
       scored AS (SELECT id_a, id_b,
                         list_dot_product(ea, eb)
                           / (sqrt(list_dot_product(ea, ea)) * sqrt(list_dot_product(eb, eb))) AS sim
                  FROM pairs)
       SELECT id_a, id_b, round(sim, 5) AS sim FROM scored WHERE sim >= 0.3""",
)
def sim_embedding_neardup_lsh(spark, sf_dir):
    """Scale path for embedding near-dup: LSH-bucket (same-signature
    pairs only) then exact-verify.  Oracle-checked via the
    deterministic md5 hyperplanes — DuckDB reproduces the exact
    bucketing, so the approximation's candidate set is value-verified.

    Threshold 0.3 is fixture-calibrated: the synthetic uniform
    embeddings contain no true near-dups (max same-bucket cosine
    ≈ 0.44 at sf0.01), so a production-style 0.9 cut would return an
    empty — hence vacuous — value check; 0.3 keeps the verify stage
    exercised end-to-end."""
    e = load_table(spark, sf_dir, "embeddings")
    lsh = sim.DeterministicHyperplaneLSH(dim=64, num_bits=8, salt="lsh")
    got = sim.embedding_near_duplicates(e, dim=64, threshold=0.3, lsh=lsh)
    return got.select("id_a", "id_b", F.round("sim", 5).alias("sim"))


@q(
    "dedup_components",
    f"""WITH RECURSIVE {_LSH_SIG_SQL},
       vs AS (SELECT v.vec_id, v.e, sig.s FROM v JOIN sig USING (vec_id)),
       prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ea, b.e AS eb
               FROM vs a JOIN vs b ON a.s = b.s AND a.vec_id < b.vec_id),
       e2 AS (SELECT id_a, id_b FROM prs
              WHERE list_dot_product(ea, eb)
                    / (sqrt(list_dot_product(ea, ea)) * sqrt(list_dot_product(eb, eb))) >= 0.3),
       sym AS (SELECT id_a AS u, id_b AS v FROM e2
               UNION SELECT id_b, id_a FROM e2),
       reach(u, v) AS (SELECT u, v FROM sym
                       UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
       SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u""",
)
def dedup_components(spark, sf_dir):
    """Dedup grouping: transitive closure of the near-dup pair graph
    (the deterministic-LSH embedding pairs) into components with a
    canonical min-id representative — the pairs→groups step a dedup
    pipeline ends with.  Spark side is iterative min-label propagation
    with pointer jumping (O(log n) rounds, three shuffles/round, no
    driver-side row data); the oracle recomputes the closure with a
    recursive CTE over the identical md5-plane candidate pairs."""
    e = load_table(spark, sf_dir, "embeddings")
    lsh = sim.DeterministicHyperplaneLSH(dim=64, num_bits=8, salt="lsh")
    pairs = sim.embedding_near_duplicates(e, dim=64, threshold=0.3, lsh=lsh)
    return connected_components(pairs.select("id_a", "id_b"))


# =========================================================================
# Pipeline extensions: multimodal plumbing
# =========================================================================


@q(
    "mm_payload_size",
    "SELECT doc_id AS media_id, strlen(text) AS payload_size FROM documents",
)
def mm_payload_size(spark, sf_dir):
    """Binary payload ingestion: byte sizes of the encoded payload
    column (metadata plumbing; decode itself is stubbed)."""
    from adfs_spark.functions.multimodal import from_documents

    d = load_table(spark, sf_dir, "documents")
    media = from_documents(d)
    return media.select("media_id", F.octet_length("payload").alias("payload_size"))


@q(
    "mm_feature_extract",
    """SELECT doc_id AS media_id, octet_length(encode(text)) AS payload_size,
              sha256(text) AS content_hash
       FROM documents""",
)
def mm_feature_extract(spark, sf_dir):
    """Arrow-batched feature extraction over binary payloads
    (deterministic stub decode).  The metadata outputs (size, sha256)
    are engine-independent, so the mapInPandas plumbing is
    oracle-checked; the stub feature vector itself is not emitted."""
    from adfs_spark.functions.multimodal import extract_features, from_documents

    d = load_table(spark, sf_dir, "documents")
    media = from_documents(d)
    feats = extract_features(media, dim=8)
    return feats.select("media_id", "payload_size", "content_hash")


@q(
    "mm_media_neardup",
    """WITH fp(media_id, modality, fp) AS (VALUES
         (1, 'image', CAST(26917826709552000 AS BIGINT)),
         (2, 'image', CAST(31289484939492226 AS BIGINT)),
         (3, 'image', CAST(5634480095382941873 AS BIGINT)),
         (4, 'audio', CAST(72048800092127295 AS BIGINT)),
         (5, 'audio', CAST(72048800092127295 AS BIGINT)),
         (6, 'audio', CAST(4476313079579402720 AS BIGINT)),
         (7, 'video', CAST(5760017458344861858 AS BIGINT)),
         (8, 'video', CAST(5760017458344861858 AS BIGINT)),
         (9, 'video', CAST(5791681568035681466 AS BIGINT)))
       SELECT a.media_id AS id_a, b.media_id AS id_b, a.modality,
              CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       FROM fp a JOIN fp b
         ON a.modality = b.modality AND a.media_id < b.media_id
       WHERE bit_count(xor(a.fp, b.fp)) <= 6""",
)
def mm_media_neardup(spark, sf_dir):
    """Media near-dup as a driver row: deterministic image/audio/video
    payloads (BMP+PNG cross-container images, PCM WAV tones, AVI frame
    stacks, plus one undecodable blob) go through the FULL Spark
    pipeline — Arrow-batched decode → modality fingerprints (DCT pHash
    / energy-envelope afp / frame-majority vhash, multimodal.py:485-
    655) → per-modality pigeonhole hamming join.  The oracle holds the
    expected 64-bit fingerprints as golden literals and derives the
    threshold pairs relationally (xor + bit_count), so a drift in any
    codec, fingerprint, or the banding join fails the driver gate —
    the same golden-value trick as dedup_simhash/s11.  Recall is exact
    by the pigeonhole guarantee (num_chunks 8 > max_hamming 6),
    precision exact by the verify filter, so pipeline == all-pairs."""
    import numpy as np

    from adfs_spark.functions.multimodal import (
        encode_avi,
        encode_bmp,
        encode_png,
        encode_wav,
        media_near_duplicates,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    grad = np.linspace(0, 255, 64, dtype=np.uint8)
    base[:, :, 0] = grad[None, :]
    base[:24, :, 1] = 200
    noisy = base.copy()
    noisy[::16, ::16] = 255 - noisy[::16, ::16]
    other = np.zeros((48, 64, 3), dtype=np.uint8)
    other[:, ::2, 2] = 255

    t = np.arange(16000) / 8000.0
    am1 = np.sin(2 * np.pi * 440 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))
    rng2 = np.random.default_rng(23)
    am1n = am1 + rng2.normal(0, 0.01, am1.shape)
    am2 = np.sin(2 * np.pi * 440 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3.7 * t + 1.1))

    rngv = np.random.default_rng(11)
    _ = rngv.normal(0, 0.01, 16000)  # keep the video textures on the
    # same deterministic draw path as the pytest fixture
    tex = np.kron(rngv.integers(0, 256, (6, 8)), np.ones((4, 4), dtype=np.int64)).astype(np.uint8)
    bf = np.stack([tex, tex // 2, tex // 3], axis=2)
    frames = [bf.copy() for _ in range(4)]
    for i, fr in enumerate(frames):
        fr[:, :, 1] = np.minimum(fr[:, :, 1].astype(np.int16) + i * 10, 255).astype(np.uint8)
    corrupted = [fr.copy() for fr in frames]
    corrupted[2][::8, ::8] = 0
    tex2 = np.kron(rngv.integers(0, 256, (6, 8)), np.ones((4, 4), dtype=np.int64)).astype(np.uint8)
    other_frames = [np.stack([tex2, tex2, tex2], axis=2) for _ in range(4)]

    rows = [
        (1, bytearray(encode_bmp(base))),
        (2, bytearray(encode_png(noisy))),  # near-dup of 1, other container
        (3, bytearray(encode_bmp(other))),
        (4, bytearray(encode_wav(8000, am1))),
        (5, bytearray(encode_wav(8000, am1n))),  # same envelope as 4
        (6, bytearray(encode_wav(8000, am2))),
        (7, bytearray(encode_avi(frames))),
        (8, bytearray(encode_avi(corrupted))),  # one damaged frame
        (9, bytearray(encode_avi(other_frames))),
        (10, bytearray(b"\xff\xd8\xff not decodable")),  # excluded
    ]
    media = spark.createDataFrame(rows, "media_id: long, payload: binary")
    return media_near_duplicates(media, max_hamming=6).select(
        "id_a", "id_b", "modality", F.col("hamming").cast("long").alias("hamming")
    )


# =========================================================================
# Event-time windows (the idiomatic-Spark extension; §2.10 note)
# =========================================================================


@q(
    "events_hourly_window",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              event_type, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def events_hourly_window(spark, sf_dir):
    """Tumbling event-time window aggregate (batch form of the D6/D7
    streaming loops; watermarked streaming twin in adfs_spark.streaming)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        _dsum("value", "sum_value", longsum=_fits_longsum(sf_dir, "events")),
    )


@q(
    "events_latest_per_user",
    """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM
       (SELECT user_id, event_id, ts, row_number() OVER
          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
       WHERE rn = 1""",
)
def events_latest_per_user(spark, sf_dir):
    """D6 heartbeat-upsert semantics in batch: latest event per user."""
    e = load_table(spark, sf_dir, "events")
    win = group_argmax(
        e, ["user_id"], ["ts", "event_id"], payload_cols=["user_id", "event_id", "ts"]
    )
    return win.select(
        "user_id", "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s")
    )


# =========================================================================
# Headline analytics (bench queries; TPC-H-style shapes)
# =========================================================================


@q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped pricing summary.  Money sums run on
    the scaled-long route under the size gate (r9, −74% on the
    aggregation: the decimal casts were ~100% of the single-rowgroup
    stage at sf0.1 and of the 41.9 s warm sf100 row)."""
    li = load_table(spark, sf_dir, "lineitem")
    lf = _fits_longsum(sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty", longsum=lf),
            _dsum("l_extendedprice", "sum_base_price", longsum=lf),
            _dsum4(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_disc_price",
                longsum=lf,
            ),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "q3_unshipped_revenue",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
             AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY o_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderkey LIMIT 10""",
)
def q3_unshipped_revenue(spark, sf_dir):
    """TPC-H Q3-shaped: top unshipped orders by revenue."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    # customer is SF-scaled — no forced broadcast; AQE picks the
    # strategy from runtime sizes (the filtered segment may still
    # qualify for a runtime broadcast at small SF).
    j = fk_join(o, c, "o_custkey", "c_custkey")
    j = li.join(j, li["l_orderkey"] == j["o_orderkey"])
    out = (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(
            _dsum4(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                longsum=_fits_longsum(sf_dir),
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )
    return out.select("o_orderkey", _day("o_orderdate").alias("o_orderdate_s"), "revenue")


@q(
    "q5_nation_revenue",
    """SELECT n_name,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name IN ('ASIA', 'AFRICA')
       GROUP BY n_name""",
)
def q5_nation_revenue(spark, sf_dir, early: bool | None = None):
    """TPC-H Q5-shaped: local-supplier revenue by nation.

    Two plan forms, chosen by a driver-side table-size probe (the
    same stats a CBO would read; Catalyst won't reorder a join chain
    without them):

    - ``early=True`` — dim restriction FIRST: region⋈nation is
      constant-size, so the ~10 valid nation keys broadcast onto
      customer/supplier as map-side joins and every downstream shuffle
      moves only the qualifying ~40% of rows.  −44% at sf10, the only
      sane plan at 100 TB.  While supplier itself is broadcast-sized
      (``Q5_SUPPLIER_BROADCAST_MAX_BYTES``), the filtered supplier
      slice additionally broadcasts onto lineitem BEFORE the
      l_orderkey exchange, so the one unavoidable fact shuffle carries
      only the qualifying ~40% of lineitem rows.
    - ``early=False`` — plain join chain with the region filter at the
      end.  The two extra broadcast stages of the early form cost a
      fixed ~0.3 s, which DOMINATES when the whole fact-fact shuffle
      is a few MB (measured: 0.92 s vs 1.20 s at sf0.1).

    ``early=None`` auto-selects: early once lineitem's on-disk footprint
    crosses ``Q5_EARLY_RESTRICT_MIN_BYTES`` (between the measured
    sf0.1 loss and the measured sf1+ win); unknown sizes (non-local
    storage) default to early — the scale-safe side.  Both plan shapes
    are pinned by tests/test_plans.py; results are identical."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AFRICA"))
    if early is None:
        sz = _table_disk_bytes(sf_dir, "lineitem")
        early = sz is None or sz >= Q5_EARLY_RESTRICT_MIN_BYTES
    if early:
        nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name"
        )
        c2 = c.join(F.broadcast(nr), c["c_nationkey"] == nr["n_nationkey"]).select(
            "c_custkey", "c_nationkey", "n_name"
        )
        s2 = s.join(
            F.broadcast(nr.select("n_nationkey")),
            s["s_nationkey"] == nr["n_nationkey"],
        ).select("s_suppkey", "s_nationkey")
        # Restrict ORDERS through the qualified customers BEFORE the
        # fact-fact join (r9): o⋈c2 shuffles 150M orders against the
        # ~40% customer slice, so only qualifying orders (and their
        # nation tags) meet lineitem.  Measured at the 600M-row
        # rung: 99.4 s → 65.3 s (−34%); a wash at sf10 where nothing
        # spills.  customer/supplier grow with SF (sf100 customer
        # ≈ 15M rows), so no forced broadcasts of those — AQE decides
        # from runtime sizes for the filtered c2/s2 sides.
        o2 = o.join(c2, o["o_custkey"] == c2["c_custkey"]).select(
            "o_orderkey", "c_nationkey", "n_name"
        )
        # Restrict LINEITEM through the qualified suppliers BEFORE the
        # l_orderkey exchange (r9, guide §3.2): s_suppkey is unique, so
        # the inner join multiplies no rows and only drops the ~60% of
        # lineitem whose supplier sits outside the region — the one
        # unavoidable fact shuffle then carries 40% of the rows at the
        # same row width (s_nationkey replaces l_suppkey).  Forced
        # broadcast only while supplier is provably small (gate above);
        # past the gate a planner-chosen SMJ here would shuffle
        # lineitem an extra time on l_suppkey, so the plain shape wins.
        sup_sz = _table_disk_bytes(sf_dir, "supplier")
        if sup_sz is not None and sup_sz <= Q5_SUPPLIER_BROADCAST_MAX_BYTES:
            li2 = li.join(F.broadcast(s2), li["l_suppkey"] == s2["s_suppkey"]).select(
                "l_orderkey", "l_extendedprice", "l_discount", "s_nationkey"
            )
            j = li2.join(
                o2,
                (li2["l_orderkey"] == o2["o_orderkey"])
                & (li2["s_nationkey"] == o2["c_nationkey"]),
            )
        else:
            j = li.join(o2, li["l_orderkey"] == o2["o_orderkey"]).join(
                s2,
                (li["l_suppkey"] == s2["s_suppkey"])
                & (s2["s_nationkey"] == F.col("c_nationkey")),
            )
    else:
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(
                s,
                (li["l_suppkey"] == s["s_suppkey"])
                & (s["s_nationkey"] == c["c_nationkey"]),
            )
            .join(n, c["c_nationkey"] == n["n_nationkey"])
            .join(r, n["n_regionkey"] == r["r_regionkey"])
        )
    return j.groupBy("n_name").agg(
        _dsum4(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
            longsum=_fits_longsum(sf_dir),
        )
    )


@q(
    "q6_filtered_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              count(*) AS n
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def q6_filtered_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + global aggregate.  Every predicate
    is scan-pushable (parquet row-group stats prune on l_shipdate); at
    100 TB this reads a fraction of the table and shuffles one row."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            _dsum4(
                F.col("l_extendedprice") * F.col("l_discount"),
                "revenue",
                longsum=_fits_longsum(sf_dir),
            ),
            F.count("*").alias("n"),
        )
    )


@q(
    "q14_promo_revenue",
    """SELECT CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                          AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1995-07-01 00:00:00'""",
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: fact ⋈ dimension with a conditional aggregate.
    part is SF-scaled (sf100 ≈ 20M rows), so the broadcast decision is
    left to AQE: small SF gets a runtime broadcast (fact side never
    shuffles), huge SF degrades gracefully to a shuffle join instead of
    OOMing executors on a forced broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            _dsum4(
                F.when(F.col("p_type") == "PROMO", disc).otherwise(0),
                "promo_revenue",
                longsum=_fits_longsum(sf_dir),
            ),
            _dsum4(disc, "total_revenue", longsum=_fits_longsum(sf_dir)),
        )
    )


@q(
    "asof_click_after_error",
    """SELECT l.event_id, l.user_id,
              strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
              r.event_id AS error_event_id,
              strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS error_ts
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') r
       ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
def asof_click_after_error(spark, sf_dir):
    """As-of join: each click paired with the same user's most recent
    error at-or-before it (point-in-time alignment; union +
    running-last window — one shuffle, no range explosion)."""
    from adfs_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    j = asof_join(clicks, errors, on="user_id", left_ts="ts", how="inner")
    return j.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("event_id_right").alias("error_event_id"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
    )


@q(
    "range_errors_before_click",
    """SELECT l.event_id, count(r.event_id) AS n_errors
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       JOIN (SELECT * FROM events WHERE event_type = 'error') r
         ON l.user_id = r.user_id
        AND r.ts > l.ts - INTERVAL 6 HOUR AND r.ts <= l.ts
       GROUP BY l.event_id""",
)
def range_errors_before_click(spark, sf_dir):
    """Band join: per click, how many errors the same user hit in the
    preceding 6 hours (bucketed equi-join, not a theta join)."""
    from adfs_spark.operators.joins import range_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), F.col("event_id")
    )
    j = range_join(
        clicks, errors, on="user_id", left_ts="ts_us", delta=6 * 3600 * 1000 * 1000
    )
    return j.groupBy("event_id").agg(F.count("event_id_right").alias("n_errors"))


@q(
    "pipeline_split_counts",
    """SELECT source,
              CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 1000
                   THEN 'holdout' ELSE 'train' END AS split,
              count(*) AS n
       FROM documents GROUP BY 1, 2""",
)
def pipeline_split_counts(spark, sf_dir):
    """Deterministic 90/10 train/holdout split by content hash of the
    key — reproducible across engines/retries/partitionings (leakage-
    safe), unlike random sampling.  Stateless projection: no shuffle."""
    from adfs_spark.functions.sampling import split_assign

    d = load_table(spark, sf_dir, "documents")
    return (
        split_assign(d, "doc_id", holdout_bp=1000)
        .groupBy("source", "split")
        .agg(F.count("*").alias("n"))
    )


@q(
    "pipeline_stratified_cap",
    """SELECT doc_id, source FROM documents
       WHERE ('0x' || substring(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 2000""",
)
def pipeline_stratified_cap(spark, sf_dir):
    """Per-stratum 20% hash cap (corpus mixing): one stateless filter,
    stable keep-set, no per-stratum counting or shuffle."""
    from adfs_spark.functions.sampling import stratified_cap

    d = load_table(spark, sf_dir, "documents")
    return stratified_cap(d, "source", "doc_id", cap_bp=2000).select(
        "doc_id", "source"
    )


@q(
    "events_json_extract",
    """SELECT event_type,
              sum(json_extract(props, '$.k')::BIGINT) AS sum_k,
              count(json_extract(props, '$.k')) AS n_with_k
       FROM events GROUP BY event_type""",
)
def events_json_extract(spark, sf_dir):
    """Semi-structured extraction: pull a typed field out of a JSON
    string column and aggregate — JVM-side `get_json_object`, no
    Python.  At scale, promote hot JSON fields to real columns at
    ingest; this is the query-time fallback."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


@q(
    "agg_pivot_priority",
    """SELECT o_orderstatus,
              count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
              count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
              count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium
       FROM orders GROUP BY o_orderstatus""",
)
def agg_pivot_priority(spark, sf_dir):
    """Reshape: status × priority counts as columns.  The explicit
    values list keeps pivot a single-pass aggregate (no distinct-values
    pre-scan) — required at scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            F.coalesce("1-URGENT", F.lit(0)).alias("urgent"),
            F.coalesce("2-HIGH", F.lit(0)).alias("high"),
            F.coalesce("3-MEDIUM", F.lit(0)).alias("medium"),
        )
    )


@q(
    "events_sliding_window",
    """SELECT strftime(date_trunc('hour', ts) - to_hours(s.o), '%Y-%m-%d %H:%M:%S') AS win_start,
              count(*) AS n
       FROM events, (SELECT unnest([0, 1]) AS o) s
       GROUP BY 1""",
)
def events_sliding_window(spark, sf_dir):
    """Sliding event-time windows (2h length, 1h slide): each event
    lands in exactly two windows.  Batch twin of the streaming sliding
    aggregate; `F.window` expands rows map-side, one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
    )


@q(
    "set_ops_customers",
    """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
            y96 AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
       SELECT 'churned' AS tag, o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
       UNION ALL
       SELECT 'retained' AS tag, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)""",
)
def set_ops_customers(spark, sf_dir):
    """Set algebra: 1995 buyers EXCEPT/INTERSECT 1996 buyers.  Both
    plan as hash joins over pre-deduped sides (one shuffle each), never
    row-comparison loops."""
    o = load_table(spark, sf_dir, "orders")

    def buyers(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y+1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = buyers(1995), buyers(1996)
    churned = y95.subtract(y96).select(F.lit("churned").alias("tag"), "o_custkey")
    retained = y95.intersect(y96).select(F.lit("retained").alias("tag"), "o_custkey")
    return churned.unionByName(retained)


@q(
    "window_running_total",
    """SELECT o_custkey, o_orderkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS running_spend
       FROM orders""",
)
def window_running_total(spark, sf_dir):
    """Frame-spec window (absent from the reference, SURVEY §2.5):
    per-customer running spend in order-date order.  Decimal
    accumulation keeps every prefix sum exact; orderkey tiebreak makes
    the frame deterministic."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lf = _fits_longsum(sf_dir, "orders")
    if lf is True:
        return o.select(
            "o_custkey",
            "o_orderkey",
            _lfin(F.sum(_lraw("o_totalprice")).over(w), "running_spend"),
        )
    if lf == "wide":
        # scaled-long terms, decimal accumulation (see _lsum_wide) —
        # the same exact value with unbounded running-sum headroom
        return o.select(
            "o_custkey",
            "o_orderkey",
            _lfin(
                F.sum(_lraw("o_totalprice").cast("decimal(20,0)")).over(w),
                "running_spend",
            ),
        )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@q(
    "window_event_gaps",
    """SELECT event_id, user_id,
              date_diff('second',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) AS gap_s
       FROM events""",
)
def window_event_gaps(spark, sf_dir):
    """lag(): seconds since the user's previous event (NULL for the
    first) — the primitive under sessionization."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev)).alias("gap_s"),
    )


@q(
    "w_rank_dense_ties",
    """SELECT o_custkey, o_orderkey,
              rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rnk,
              dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)
                AS drnk
       FROM orders WHERE o_custkey % 50 = 0""",
)
def w_rank_dense_ties(spark, sf_dir):
    """rank() vs dense_rank() under real ties (5 distinct priorities
    per customer guarantee them): gap-ranking and dense-ranking are
    both tie-stable — every row in a tie group gets the same value —
    so the result is deterministic without a full tiebreak."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@q(
    "window_spend_quartiles",
    """WITH spend AS (
         SELECT o_custkey,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
         FROM orders GROUP BY o_custkey)
       SELECT o_custkey, total_spend,
              ntile(4) OVER (ORDER BY total_spend DESC, o_custkey) AS quartile,
              round(percent_rank() OVER (ORDER BY total_spend DESC, o_custkey), 5)
                AS pct_rank
       FROM spend""",
)
def window_spend_quartiles(spark, sf_dir):
    """ntile + percent_rank (the remaining rank-family primitives):
    customer spend quartiles over a GLOBAL ordering — WITHOUT the
    unpartitioned window those functions usually imply.  The global
    rank comes from two-pass partition-offset numbering over quantile
    range buckets (operators.windows.global_row_number — one
    hash-partitioned exchange, no single-task funnel), then ntile and
    percent_rank are pure per-row arithmetic on (rank, n): the
    custkey tiebreak makes the order total, so rank == row_number and
    percent_rank = (rn-1)/(n-1) exactly.  This is the form that
    survives a fact-table-sized input; the oracle stays the standard
    window SQL."""
    o = load_table(spark, sf_dir, "orders")
    from adfs_spark.operators.windows import global_row_number, ntile_of

    spend = o.groupBy("o_custkey").agg(
        _dsum(
            "o_totalprice",
            "total_spend",
            longsum=_fits_longsum(sf_dir, "orders"),
        )
    )
    keyed = spend.withColumn("_negspend", -F.col("total_spend"))
    ranked, n = global_row_number(keyed, "_negspend", ["o_custkey"], out_col="_rn")
    return ranked.select(
        "o_custkey",
        "total_spend",
        ntile_of(F.col("_rn"), n, 4).alias("quartile"),
        F.round((F.col("_rn") - 1) / F.lit(max(n - 1, 1)), 5).alias("pct_rank"),
    )


@q(
    "d7_table_diff",
    """WITH l AS (SELECT o_orderkey, o_totalprice FROM orders),
            r AS (SELECT o_orderkey,
                         CASE WHEN o_orderkey % 50 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS o_totalprice
                  FROM orders WHERE o_orderkey % 97 <> 0
                  UNION ALL
                  SELECT o_orderkey + 10000000, o_totalprice FROM orders WHERE o_orderkey % 101 = 0)
       SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
              CASE WHEN l.o_orderkey IS NULL THEN 'added'
                   WHEN r.o_orderkey IS NULL THEN 'removed'
                   WHEN l.o_totalprice <> r.o_totalprice THEN 'changed' END AS diff
       FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
       WHERE l.o_orderkey IS NULL OR r.o_orderkey IS NULL OR l.o_totalprice <> r.o_totalprice""",
)
def d7_table_diff(spark, sf_dir):
    """Anti-entropy value diff of two table states (added / removed /
    changed) — J5/D7 reconciliation generalized from key presence to
    value equality.  The divergent replica is synthesized
    deterministically from orders."""
    from adfs_spark.operators.delta import table_diff

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    changed = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 50 == 0, F.col("o_totalprice") + 10).otherwise(
            F.col("o_totalprice")
        ),
    ).filter(F.col("o_orderkey") % 97 != 0)
    added = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"), "o_totalprice"
    )
    replica = changed.unionByName(added)
    return table_diff(o, replica, pk=["o_orderkey"])


@q(
    "pipeline_weighted_mix",
    """SELECT source, count(*) AS n_kept
       FROM documents
       WHERE ('0x' || substring(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
             < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                           WHEN 'src2' THEN 1500 ELSE 500 END
       GROUP BY source""",
)
def pipeline_weighted_mix(spark, sf_dir):
    """Pretraining corpus mix: per-source keep-rates (100%/50%/15%,
    default 5%) via the deterministic hash bucket — one stateless
    filter, reproducible across engines and runs."""
    from adfs_spark.functions.sampling import weighted_mix

    d = load_table(spark, sf_dir, "documents")
    mixed = weighted_mix(
        d,
        {"src0": 1.0, "src1": 0.5, "src2": 0.15},
        strata_col="source",
        key_col="doc_id",
        default_bp=500,
    )
    return mixed.groupBy("source").agg(F.count("*").alias("n_kept"))


@q(
    "pipeline_pack_batches",
    """WITH t AS (SELECT source, doc_id,
                         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
                  FROM documents),
            c AS (SELECT source, doc_id, n_tok,
                         COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
                  FROM t)
       SELECT source, CAST(floor(before / 500) AS BIGINT) AS bin,
              count(*) AS n_docs, sum(n_tok) AS sum_tokens
       FROM c GROUP BY 1, 2""",
)
def pipeline_pack_batches(spark, sf_dir):
    """Token-budget batch packing: documents stream into ~500-token
    bins per source via an exact running token count (bin =
    floor(prefix_sum/budget); a bin exceeds budget by at most one
    document).  Packing is per-source so the window never needs a
    global order — at scale the partition key is the shard."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", textf.token_count(F.col("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        t.withColumn("bin", F.floor(before / 500))
        .groupBy("source", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("sum_tokens"))
    )


@q(
    "pipeline_clean_corpus",
    """WITH keepers AS (SELECT md5(text) AS fp, min(doc_id) AS keeper
                        FROM documents GROUP BY 1)
       SELECT source, count(*) AS n_kept
       FROM documents d JOIN keepers k
         ON md5(d.text) = k.fp AND d.doc_id = k.keeper
       WHERE len(list_filter(string_split(d.text, ' '), x -> x <> '')) >= 10
         AND CAST(length(regexp_replace(d.text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
             / greatest(length(d.text), 1) < 0.2
       GROUP BY source""",
)
def pipeline_clean_corpus(spark, sf_dir):
    """Composed C4-style cleaning pass: exact-dedup to one keeper per
    content, drop short docs (<10 tokens) and punctuation-heavy docs
    (≥20%), count survivors per source.  One md5 groupBy + stateless
    filters — the whole clean is two shuffles at any scale."""
    from adfs_spark.functions.dedup import drop_exact_duplicates

    d = load_table(spark, sf_dir, "documents")
    kept = drop_exact_duplicates(d, "doc_id", "text").filter(
        (textf.token_count(F.col("text")) >= 10)
        & (textf.punct_ratio(F.col("text")) < 0.2)
    )
    return kept.groupBy("source").agg(F.count("*").alias("n_kept"))


@q(
    "pipeline_scrub_pii",
    """WITH aug AS (
         SELECT doc_id,
                text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.7 ref 9' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS t
         FROM documents),
       s AS (
         SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                                   '<EMAIL>', 'g'),
                    '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                  '\\b\\d{10,}\\b', '<LONGNUM>', 'g') AS scrubbed
         FROM aug)
       SELECT doc_id, scrubbed,
              len(regexp_extract_all(scrubbed, '<EMAIL>|<IP>|<LONGNUM>')) AS n_masked
       FROM s""",
)
def pipeline_scrub_pii(spark, sf_dir):
    """PII scrub pass: mask emails / IPv4s / long digit runs with typed
    placeholders (text.scrub_pii), count masks per doc.  Pure
    regexp_replace chain inside whole-stage codegen.

    The fixture corpus contains no PII, so the check plants a
    deterministic email+IP+number per doc (mirrored in the oracle);
    the value compare then proves Java-regex/RE2 behavioral parity on
    the masked output itself."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ref 9"),
            F.lpad(F.col("doc_id").cast("string"), 10, "0"),
        ).alias("t"),
    )
    s = aug.select("doc_id", textf.scrub_pii(F.col("t")).alias("scrubbed"))
    return s.select(
        "doc_id", "scrubbed", textf.pii_mask_count(F.col("scrubbed")).alias("n_masked")
    )


@q("agg_hll_distinct", None)  # HLL sketch: engine-specific estimate
def agg_hll_distinct(spark, sf_dir):
    """Mergeable-sketch distinct count (HyperLogLog++): unlike exact
    countDistinct's two-shuffle expand, the sketch partial-aggregates
    map-side and the shuffle carries one ~kB sketch per group — the
    100 TB path for cardinality.  Accuracy vs exact is pytest-checked
    (<5% rel. error); no cross-engine oracle because DuckDB's
    approx_count_distinct uses a different estimator."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_customers_approx")
    )


@q(
    "agg_exact_quantiles",
    """SELECT o_orderstatus,
              list_transform(quantile_cont(o_totalprice, [0.25, 0.5, 0.75]),
                             x -> round(x, 4)) AS quartiles
       FROM orders GROUP BY o_orderstatus""",
)
def agg_exact_quantiles(spark, sf_dir):
    """Exact linear-interpolation quartiles per group (Spark
    `percentile`; at scale swap for `percentile_approx`, which is
    mergeable map-side — exact percentile shuffles per-group values)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.transform(
            F.expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))"),
            lambda x: F.round(x, 4),
        ).alias("quartiles")
    )


@q("agg_approx_quantiles", None)  # sketch: engine-specific estimate
def agg_approx_quantiles(spark, sf_dir):
    """The 100 TB quantile path: `approx_percentile` (KLL-style sketch)
    partial-aggregates map-side and ships one bounded sketch per
    (partition, group) — exact `percentile` must move every value to
    its group's reducer.  Accuracy vs exact is pytest-bounded by the
    sketch's rank-error contract; no cross-engine oracle because
    DuckDB's approx_quantile uses a different estimator (same reason
    as agg_hll_distinct)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.25D, 0.5D, 0.75D), 10000)"
        ).alias("quartiles_approx")
    )


# =========================================================================
# Aggregation generalizations — SURVEY §2.4's "free upgrades" made real:
# rollup/cube, distinct aggregates, and the subquery shapes (EXISTS /
# NOT EXISTS / per-group scalar threshold) the reference never had.
# =========================================================================


@q(
    "agg_rollup_status_priority",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)
def agg_rollup_status_priority(spark, sf_dir):
    """Hierarchical subtotals: (status, priority) → (status) → ().
    One shuffle; Spark expands grouping sets map-side."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        _dsum("o_totalprice", "sum_price", longsum=_fits_longsum(sf_dir, "orders")),
    )


@q(
    "agg_cube_flag_status",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_cube_flag_status(spark, sf_dir):
    """All 2^k marginal totals in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        _dsum("l_quantity", "sum_qty", longsum=_fits_longsum(sf_dir)),
    )


@q(
    "agg_count_distinct",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
              count(*) AS n_orders
       FROM orders GROUP BY o_orderpriority""",
)
def agg_count_distinct(spark, sf_dir):
    """Distinct aggregate: Spark plans a two-phase partial-distinct
    expand, so the shuffle carries (priority, custkey) pairs pre-deduped
    map-side rather than raw rows."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@q(
    "sq_exists_late_ship",
    """SELECT o_orderpriority, count(*) AS n_orders
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
       GROUP BY o_orderpriority""",
)
def sq_exists_late_ship(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS ≡ left-semi join on the
    correlation key plus the non-equi ship-after-order predicate."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@q(
    "sq_not_exists_inactive",
    """SELECT c_nationkey, count(*) AS n_customers,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
       FROM customer c
       WHERE c_acctbal > 0
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
       GROUP BY c_nationkey""",
)
def sq_not_exists_inactive(spark, sf_dir):
    """TPC-H Q22 shape: NOT EXISTS ≡ left-anti join — positive-balance
    customers with no big-ticket order, per nation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    inactive = c.filter(F.col("c_acctbal") > 0).join(
        big, c["c_custkey"] == big["o_custkey"], "left_anti"
    )
    # c_acctbal can be negative in general (the +0.5/truncate rounding
    # needs x ≥ 0), but the aggregated set is filtered to c_acctbal > 0
    # above, so the long route's precondition holds by construction.
    return inactive.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        _dsum("c_acctbal", "sum_acctbal", longsum=_fits_longsum(sf_dir, "customer")),
    )


@q(
    "sq_scalar_small_quantity",
    """WITH thr AS (
         SELECT l_partkey AS pk,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.5 / count(*) AS t
         FROM lineitem GROUP BY l_partkey)
       SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              count(*) AS n
       FROM lineitem JOIN thr ON l_partkey = pk
       WHERE l_quantity < t""",
)
def sq_scalar_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: per-group scalar threshold (half the mean
    quantity per part) applied back to the rows — aggregate + self-join
    on the group key.  The threshold arithmetic is written identically
    in both engines (exact decimal sum, then double multiply/divide) so
    boundary comparisons agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    lf = _fits_longsum(sf_dir)
    sq = _dsum("l_quantity", "_sq", longsum=lf)
    thr = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(sq, F.count("*").alias("_n"))
        .select("pk", (F.col("_sq") * 0.5 / F.col("_n")).alias("t"))
    )
    return (
        li.join(thr, li["l_partkey"] == thr["pk"])
        .filter(F.col("l_quantity") < F.col("t"))
        .agg(
            _dsum("l_extendedprice", "sum_price", longsum=lf),
            F.count("*").alias("n"),
        )
    )


@q(
    "sq_sole_late_shipper",
    """WITH late AS (
         SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
       SELECT s_suppkey, s_name, count(*) AS numwait
       FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
       WHERE EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late l3
                         WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
       GROUP BY s_suppkey, s_name""",
)
def sq_sole_late_shipper(spark, sf_dir):
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS composition —
    per-supplier count of late lines in multi-supplier orders where no
    OTHER supplier was late (sole-blame attribution).  Decorrelated as
    semi-join (another supplier in the order) then anti-join (another
    LATE supplier) on the same key, so both subqueries reuse one
    orderkey clustering; the supplier dim joins broadcast-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other_any = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    sole = (
        late.join(
            other_any,
            (F.col("l_orderkey") == F.col("_ok2"))
            & (F.col("l_suppkey") != F.col("_sk2")),
            "left_semi",
        ).join(
            other_late,
            (F.col("l_orderkey") == F.col("_ok3"))
            & (F.col("l_suppkey") != F.col("_sk3")),
            "left_anti",
        )
    )
    return (
        sole.join(s, sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )


# =========================================================================
# Additional coverage: scalar roundtrips, write-path previews, sessions
# =========================================================================


@q(
    "f1_path_roundtrip",
    """SELECT c_custkey,
              len(string_split(trim(path, '/'), '/')) AS depth,
              string_split(trim(path, '/'), '/')[1] AS root
       FROM (SELECT c_custkey, concat('/', r_name, '/', n_name, '/', c_name) AS path
             FROM customer JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey)""",
)
def f1_path_roundtrip(spark, sf_dir):
    """F1: path join → split roundtrip (Utilities.getNamesInPath :1031,
    getPathInName :1036)."""
    from adfs_spark.functions.scalar import path_split

    base = h1_chain_resolution(spark, sf_dir)
    parts = path_split(F.col("path"))
    return base.select(
        "c_custkey",
        F.size(parts).alias("depth"),
        F.element_at(parts, 1).alias("root"),
    )


@q(
    "u1_upsert_overwrite",
    """SELECT o_orderkey, CAST(price AS DOUBLE) AS price, src FROM (
         SELECT o_orderkey, CAST(o_totalprice + 5000 AS DECIMAL(18,2)) AS price,
                'incoming' AS src
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)), 'base'
         FROM orders WHERE o_orderkey % 7 <> 0)""",
)
def u1_upsert_overwrite(spark, sf_dir):
    """U1: insert-with-overwrite — incoming rows replace matching pks,
    the rest of the base survives (insertInternal :281-296).  Expressed
    as anti-join + union, the engine's MERGE building block."""
    o = load_table(spark, sf_dir, "orders")
    incoming = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        _dec(F.col("o_totalprice") + 5000).alias("price"),
        F.lit("incoming").alias("src"),
    )
    base = o.select(
        "o_orderkey", _dec("o_totalprice").alias("price"), F.lit("base").alias("src")
    )
    kept = anti_join(base, incoming.select("o_orderkey"), "o_orderkey")
    merged = kept.unionByName(incoming)
    return merged.select(
        "o_orderkey", F.col("price").cast("double").alias("price"), "src"
    )


@q(
    "u2_masked_update",
    """SELECT o_orderkey,
              CASE WHEN o_orderstatus = 'P' THEN '0-PENDING' ELSE o_orderpriority END
                AS o_orderpriority,
              CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS updated
       FROM orders""",
)
def u2_masked_update(spark, sf_dir):
    """U2: field-masked read-modify-write preview — only masked fields
    change, others pass through (updateInternal :298-314)."""
    o = load_table(spark, sf_dir, "orders")
    mask = F.col("o_orderstatus") == "P"
    return o.select(
        "o_orderkey",
        F.when(mask, "0-PENDING").otherwise(F.col("o_orderpriority")).alias(
            "o_orderpriority"
        ),
        F.when(mask, 1).otherwise(0).alias("updated"),
    )


@q(
    "a4_content_summary_tree",
    f"""WITH ns AS (
          SELECT 1 + r_regionkey AS id, -1 AS length FROM region
          UNION ALL SELECT 100 + n_nationkey, -1 FROM nation
          UNION ALL SELECT 10000 + c_custkey, c_custkey % 1000 FROM customer)
        SELECT CAST(sum(CASE WHEN length <> -1 THEN length ELSE 0 END) AS BIGINT)
                 AS total_length,
               count(CASE WHEN length <> -1 THEN 1 END) AS file_count,
               count(CASE WHEN length = -1 THEN 1 END) AS dir_count
        FROM ns""",
)
def a4_content_summary_tree(spark, sf_dir):
    """A4 proper: content summary over a namespace tree with dir
    sentinels (getContentSummary :1462-1473)."""
    from adfs_spark.operators.aggregates import content_summary

    ns = _namespace(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    lengths = ns.join(
        c.select(
            (F.col("c_custkey") + 10000).alias("id"),
            (F.col("c_custkey") % 1000).cast("long").alias("flen"),
        ),
        "id",
        "left",
    ).select(F.coalesce(F.col("flen"), F.lit(-1)).cast("long").alias("length"))
    out = content_summary(lengths)
    return out.select(
        F.col("total_length").cast("long").alias("total_length"),
        "file_count",
        "dir_count",
    )


@q(
    "events_sessionize",
    """WITH marked AS (
         SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE OR
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     THEN 1 ELSE 0 END AS new_session
         FROM events)
       SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
       FROM marked GROUP BY user_id""",
)
def events_sessionize(spark, sf_dir):
    """Sessionization: 30-minute-gap sessions per user via lag window —
    the batch twin of a session-window streaming aggregate."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@q(
    "events_session_window",
    """WITH marked AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM events),
       numbered AS (
         SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
         FROM marked)
       SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start_s,
              strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end_s,
              count(*) AS n_events,
              sum(value) AS sum_value
       FROM numbered GROUP BY user_id, sid""",
)
def events_session_window(spark, sf_dir):
    """Native ``session_window`` sessions (30-min gap) per user —
    value-checked against classic lag-SQL sessionization, proving the
    built-in's merge semantics (session = [first, last+gap); an event
    at exactly last+gap opens a new session, hence the oracle's >=).
    The same aggregate runs incrementally on a stream with state
    evicted at the watermark (streaming pytest)."""
    from adfs_spark.streaming.loops import sessionized_event_counts

    e = load_table(spark, sf_dir, "events")
    s = sessionized_event_counts(e, gap="30 minutes", watermark="2 hours")
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start_s"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end_s"),
        "n_events",
        "sum_value",
    )


_KNN_SQL = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
           FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS sim
  FROM v q JOIN v c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
SELECT query_id, neighbor_id, round(sim, 5) AS sim FROM
  (SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id) AS rn FROM pairs)
WHERE rn <= 3
"""


@q("sim_knn_join", _KNN_SQL)
def sim_knn_join(spark, sf_dir):
    """Exact k-NN join: 3 nearest neighbors for each of the first 20
    vectors (broadcast-right cross join + per-query top-k window)."""
    from adfs_spark.functions.similarity import knn_join_brute

    e = load_table(spark, sf_dir, "embeddings")
    got = knn_join_brute(e.filter(F.col("vec_id") < 20), e, k=3, exclude_self=True)
    return got.select("query_id", "neighbor_id", F.round("sim", 5).alias("sim"))


@q("text_rolling_fingerprint", None)  # xxhash64-based: engine-side only
def text_rolling_fingerprint(spark, sf_dir):
    """Winnowing-style rolling fingerprint (min shingle hash per doc)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", textf.rolling_fingerprint(F.col("text"), window=8).alias("fp")
    )


@q("sim_ivf_topk", _COS_SQL)
def sim_ivf_topk(spark, sf_dir):
    """IVF ANN, full path: train 4 centroids with distributed k-means
    (deterministic init), assign every vector to its cell, probe the
    cells nearest the query.  Probing ALL 4 cells makes the result
    exactly the brute-force top-k — so the whole IVF pipeline (train →
    assign → probe → rank) is oracle-checked against the exact cosine
    SQL; recall at n_probe < k is covered by the planted-cluster pytest."""
    from adfs_spark.functions.similarity import ivf_assign, ivf_topk, kmeans_train

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cents = kmeans_train(e, k=4, iters=2)
    assigned = ivf_assign(e, cents)
    return ivf_topk(assigned, cents, qv, k=10, n_probe=4).select(
        "vec_id", F.round("sim", 5).alias("sim")
    )


# =========================================================================
# Round-2 members: corrupt classification (J5 full form), quota usage
# (A4 + setQuota), recursive delete / mkdirs planning (H5/H6 set
# forms), lease recovery + append (U2 compositions), oracle-upgraded
# quantile/HLL rows, and the wide per-doc text feature row.
# =========================================================================


@q(
    "j5_corrupt_classify",
    """WITH stored AS (SELECT o_orderkey AS id, o_orderkey % 5 AS generationStamp,
                              o_orderkey * 3 AS length FROM orders),
            reported AS (
              SELECT id,
                     CASE WHEN id % 50 = 0 THEN generationStamp + 1
                          ELSE generationStamp END AS generationStamp,
                     length
              FROM stored WHERE id % 97 <> 0
              UNION ALL
              SELECT id + 10000000, generationStamp, length
              FROM stored WHERE id % 101 = 0)
       SELECT COALESCE(r.id, s.id) AS id,
              CASE WHEN s.id IS NULL THEN 'added'
                   WHEN r.id IS NULL THEN 'removed'
                   WHEN r.generationStamp <> s.generationStamp
                        OR r.length <> s.length THEN 'corrupt'
                   ELSE 'ok' END AS class
       FROM reported r FULL OUTER JOIN stored s ON r.id = s.id""",
)
def j5_corrupt_classify(spark, sf_dir):
    """J5 full classification: added/removed/corrupt/ok from ONE
    full-outer join (processReport :2468-2620 + CorruptReplicasMap
    markBlockAsCorrupt).  The divergent report is synthesized
    deterministically from orders."""
    from adfs_spark.operators.joins import report_classify

    o = load_table(spark, sf_dir, "orders")
    stored = o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 5).cast("long").alias("generationStamp"),
        (F.col("o_orderkey") * 3).cast("long").alias("length"),
    )
    reported = stored.filter(F.col("id") % 97 != 0).select(
        "id",
        F.when(F.col("id") % 50 == 0, F.col("generationStamp") + 1)
        .otherwise(F.col("generationStamp"))
        .alias("generationStamp"),
        "length",
    ).unionByName(
        stored.filter(F.col("id") % 101 == 0).select(
            (F.col("id") + 10000000).alias("id"), "generationStamp", "length"
        )
    )
    return report_classify(
        reported, stored, ["id"], ["generationStamp", "length"]
    )


@q(
    "a4_quota_usage",
    """WITH u AS (SELECT 100 + c_nationkey AS id, count(*) AS nsUsed
                  FROM customer GROUP BY 1)
       SELECT 100 + n_nationkey AS id,
              40 * (n_nationkey % 3) + 20 AS nsQuota,
              COALESCE(u.nsUsed, 0) AS nsUsed,
              CASE WHEN COALESCE(u.nsUsed, 0) > 40 * (n_nationkey % 3) + 20
                   THEN 1 ELSE 0 END AS exceeded
       FROM nation LEFT JOIN u ON u.id = 100 + n_nationkey""",
)
def a4_quota_usage(spark, sf_dir):
    """Quota reporting (FileProtocol.setQuota surface +
    Namespace.quota_usage): per-directory subtree usage vs nsQuota,
    with the over-quota flag — the A4 aggregate compared against the
    quota column.  Nation dirs in the synthetic namespace carry
    deterministic quotas."""
    ns = _namespace(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 100).cast("long").alias("id"),
        (40 * (F.col("n_nationkey") % 3) + 20).cast("long").alias("nsQuota"),
    )
    used = (
        ns.filter(F.col("id") >= 10000)
        .groupBy(F.col("parentId").alias("id"))
        .agg(F.count("*").alias("nsUsed"))
    )
    return n.join(used, "id", "left").select(
        "id",
        "nsQuota",
        F.coalesce("nsUsed", F.lit(0)).cast("long").alias("nsUsed"),
        F.when(F.coalesce("nsUsed", F.lit(0)) > F.col("nsQuota"), 1)
        .otherwise(0)
        .cast("long")
        .alias("exceeded"),
    )


@q(
    "h5_recursive_delete",
    f"""WITH ns AS ({_NS_SQL})
        SELECT 1 AS id
        UNION ALL SELECT id FROM ns WHERE parentId = 1
        UNION ALL SELECT id FROM ns
        WHERE parentId IN (SELECT id FROM ns WHERE parentId = 1)""",
)
def h5_recursive_delete(spark, sf_dir):
    """H5 set form: the id set a guarded recursive delete tombstones —
    target + BFS descendants (StateManager.deleteFileByFile :604-632);
    the engine's Namespace.delete feeds exactly this set into
    delete_where_keys (no driver-side id materialization)."""
    from adfs_spark.operators.hierarchy import recursive_delete_set

    ns = _namespace(spark, sf_dir)
    return recursive_delete_set(ns, 1, recursive=True)


@q(
    "h6_mkdirs_batch",
    """SELECT concat('/', r_name, '/', n_name) AS path,
              100 + n_nationkey AS parent_id,
              'newdir' AS create_name
       FROM nation JOIN region ON n_regionkey = r_regionkey""",
)
def h6_mkdirs_batch(spark, sf_dir):
    """H6 planning, batch form: resolve every path's existing prefix
    (H1 batch fixpoint join — resolve_paths_batch) and emit the
    (parent_id, name) insert set a mkdir -p would create
    (insertFileByPath :568-590 done set-at-a-time)."""
    from adfs_spark.operators.hierarchy import resolve_paths_batch

    ns = _namespace(spark, sf_dir)
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    paths = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(
        F.concat(F.lit("/"), F.col("r_name"), F.lit("/"), F.col("n_name")).alias("path")
    )
    resolved = resolve_paths_batch(ns, paths, path_col="path")
    return resolved.select(
        "path",
        F.col("id").cast("long").alias("parent_id"),
        F.lit("newdir").alias("create_name"),
    )


@q(
    "u_lease_recovery_append",
    """SELECT o_orderkey, 'recover' AS phase,
              CAST(NULL AS VARCHAR) AS holder_after,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS length
       FROM orders
       WHERE o_orderstatus = 'P' AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
       UNION ALL
       SELECT o_orderkey, 'append', concat('client-', CAST(o_custkey % 10 AS VARCHAR)),
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
       FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 11 = 0""",
)
def u_lease_recovery_append(spark, sf_dir):
    """Lease recovery + append as set-based state transitions
    (FSNamesystem.internalReleaseLease / appendFile; BASELINE.md rows
    recoverLease, append1-3).  recover: expired under-construction
    files finalize and clear their holder (T1 candidates → U2 masked
    update).  append: completed files reacquire a lease."""
    o = load_table(spark, sf_dir, "orders")
    price = _dec("o_totalprice").cast("double")
    recover = o.filter(
        (F.col("o_orderstatus") == "P")
        & (F.col("o_orderdate") < F.lit("1995-06-01 00:00:00").cast("timestamp"))
    ).select(
        "o_orderkey",
        F.lit("recover").alias("phase"),
        F.lit(None).cast("string").alias("holder_after"),
        price.alias("length"),
    )
    append = o.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 11 == 0)
    ).select(
        "o_orderkey",
        F.lit("append").alias("phase"),
        F.concat(F.lit("client-"), (F.col("o_custkey") % 10).cast("string")).alias(
            "holder_after"
        ),
        price.alias("length"),
    )
    return recover.unionByName(append)


@q(
    "text_doc_features",
    f"""WITH toks AS (SELECT doc_id,
                             list_filter(string_split(text, ' '), x -> x <> '') AS t
                      FROM documents),
            roll AS (SELECT doc_id,
                            min(md5(array_to_string(t[i:i+7], ' '))) AS rolling_fp
                     FROM toks, UNNEST(range(1, greatest(len(t)-7, 1)+1)) r(i)
                     GROUP BY doc_id),
            lang AS ({_langid_oracle_sql()}),
            grams AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
                      FROM toks, UNNEST(range(1, greatest(len(t)-1, 1)+1)) r(i)),
            gcnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
            rep AS (SELECT doc_id,
                           round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                                 / sum(c), 5) AS dup_2gram_frac,
                           round(CAST(max(c) AS DOUBLE) / sum(c), 5) AS top_2gram_frac
                    FROM gcnt GROUP BY doc_id)
       SELECT d.doc_id,
              len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS n_tokens,
              len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                AS n_bpe_tokens,
              round(CAST(len(list_filter(string_split(lower(d.text), ' '),
                    x -> x IN ('the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','be')))
                    AS DOUBLE) / greatest(len(list_filter(string_split(lower(d.text), ' '), x -> x <> '')), 1), 5)
                AS stopword_ratio,
              round(CAST(length(regexp_replace(d.text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                    / greatest(length(d.text), 1), 5) AS punct_ratio,
              lang.lang_pred,
              md5(d.text) AS fingerprint,
              roll.rolling_fp,
              rep.dup_2gram_frac,
              rep.top_2gram_frac
       FROM documents d
       JOIN lang ON lang.doc_id = d.doc_id
       JOIN roll ON roll.doc_id = d.doc_id
       JOIN rep ON rep.doc_id = d.doc_id""",
)
def text_doc_features(spark, sf_dir):
    """The whole per-document text-analysis battery in ONE row per doc:
    token count, quality ratios, language-ID, md5 fingerprint, the
    winnowing rolling fingerprint (md5 variant), and Gopher-style
    2-gram repetition fractions.  The scalar features share a single
    scan (pure projection); the repetition aggregate joins back on
    doc_id — no Python anywhere."""
    d = load_table(spark, sf_dir, "documents")
    rep = textf.repetition_stats(d, "doc_id", "text", n=2).select(
        "doc_id",
        F.round("dup_ngram_frac", 5).alias("dup_2gram_frac"),
        F.round("top_ngram_frac", 5).alias("top_2gram_frac"),
    )
    feats = d.select(
        "doc_id",
        textf.token_count(F.col("text")).alias("n_tokens"),
        F.size(textf.regex_tokens(F.col("text"))).alias("n_bpe_tokens"),
        F.round(textf.stopword_ratio(F.col("text")), 5).alias("stopword_ratio"),
        F.round(textf.punct_ratio(F.col("text")), 5).alias("punct_ratio"),
        textf.langid(F.col("text")).alias("lang_pred"),
        textf.md5_fingerprint(F.col("text")).alias("fingerprint"),
        textf.rolling_fingerprint_md5(F.col("text"), window=8).alias("rolling_fp"),
    )
    return feats.join(rep, "doc_id")


@q(
    "agg_stats_battery",
    """SELECT o.o_orderstatus,
              round(median(CAST(o_totalprice AS DOUBLE)), 4) AS median_price,
              string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
                AS priorities,
              c.corr_qty_price
       FROM orders o
       JOIN (SELECT l.l_returnflag,
                    round(corr(CAST(l_quantity AS DOUBLE),
                               CAST(l_extendedprice AS DOUBLE)), 5) AS corr_qty_price
             FROM lineitem l GROUP BY 1) c
         ON c.l_returnflag = CASE o.o_orderstatus WHEN 'F' THEN 'A'
                                                  WHEN 'O' THEN 'N' ELSE 'R' END
       GROUP BY o.o_orderstatus, c.corr_qty_price""",
)
def agg_stats_battery(spark, sf_dir):
    """The remaining aggregate primitives in one row per status: exact
    interpolated median, ordered distinct string aggregation (sorted
    collect_set → array_join — deterministic, unlike raw collect), and
    Pearson correlation (5-dp rounded; double-fold associativity noise
    sits far below that).  The corr side is keyed to a status via a
    CASE join purely to exercise an aggregate-on-aggregate join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    med = o.groupBy("o_orderstatus").agg(
        F.round(F.median(F.col("o_totalprice").cast("double")), 4).alias(
            "median_price"
        ),
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
    )
    corr = li.groupBy("l_returnflag").agg(
        F.round(
            F.corr(
                F.col("l_quantity").cast("double"),
                F.col("l_extendedprice").cast("double"),
            ),
            5,
        ).alias("corr_qty_price")
    )
    mapped = med.withColumn(
        "_rf",
        F.when(F.col("o_orderstatus") == "F", "A")
        .when(F.col("o_orderstatus") == "O", "N")
        .otherwise("R"),
    )
    return (
        mapped.join(corr, mapped["_rf"] == corr["l_returnflag"])
        .select("o_orderstatus", "median_price", "priorities", "corr_qty_price")
    )


@q(
    "agg_unpivot_metrics",
    """SELECT l_returnflag, metric,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM (
         SELECT l_returnflag, 'quantity' AS metric, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'tax', l_tax FROM lineitem)
       GROUP BY l_returnflag, metric""",
)
def agg_unpivot_metrics(spark, sf_dir):
    """UNPIVOT (the inverse of agg_pivot_priority): four measure
    columns melt into (metric, value) rows via ``DataFrame.unpivot`` —
    a map-side Expand, one row per (input row × measure), then a
    single grouped sum.  The oracle writes it as the portable UNION
    ALL form, which is exactly what Expand computes."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn("metric", F.regexp_replace("metric", "^l_", ""))
    return melted.groupBy("l_returnflag", "metric").agg(
        _dsum("value", "total", longsum=_fits_longsum(sf_dir))
    )


@q(
    "agg_quantile_rows",
    """SELECT o_orderstatus, CAST(i AS BIGINT) AS q,
              round(qs[CAST(i AS INT)], 4) AS quantile_value
       FROM (SELECT o_orderstatus,
                    quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS qs
             FROM orders GROUP BY 1), UNNEST(range(1, 4)) r(i)""",
)
def agg_quantile_rows(spark, sf_dir):
    """Exact interpolated quartiles per group, one row per quantile
    (the agg_exact_quantiles array exploded for cross-engine hashing)."""
    o = load_table(spark, sf_dir, "orders")
    qs = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))").alias("qs")
    )
    return qs.select(
        "o_orderstatus", F.posexplode("qs").alias("pos", "qv")
    ).select(
        "o_orderstatus",
        (F.col("pos") + 1).cast("long").alias("q"),
        F.round("qv", 4).alias("quantile_value"),
    )


@q(
    "agg_hll_check",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
              CAST(1 AS BIGINT) AS within_tol
       FROM orders GROUP BY o_orderpriority""",
)
def agg_hll_check(spark, sf_dir):
    """HyperLogLog++ distinct count with an error-bound oracle: the
    sketch estimate must land within 5% of the exact count (rsd=0.02 →
    ~2σ bound).  The exact count is hash-compared; the sketch accuracy
    claim rides along as a checked boolean — DuckDB's estimator differs,
    so the estimate itself can't be value-compared."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("n_exact"),
    )
    return agg.select(
        "o_orderpriority",
        "n_exact",
        (
            F.abs(F.col("approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        )
        .cast("long")
        .alias("within_tol"),
    )


@q(
    "p7_validity_probe",
    """SELECT CAST(least(count(*), 1) AS BIGINT) AS found_500,
              (SELECT CAST(least(count(*), 1) AS BIGINT)
               FROM orders WHERE o_orderkey = -1) AS found_missing
       FROM orders WHERE o_orderkey = 500""",
)
def p7_validity_probe(spark, sf_dir):
    """P7: row-validity probes in set form — a point find that returns
    0/1 (isValid, FileRepository.java:140-147), one existing and one
    missing key."""
    o = load_table(spark, sf_dir, "orders")

    def probe(key):
        return (
            indexed_find(o, ["o_orderkey"], [key])
            .limit(1)
            .agg(F.least(F.count("*"), F.lit(1)).cast("long"))
        )

    hit = probe(500).toDF("found_500")
    miss = probe(-1).toDF("found_missing")
    return hit.join(miss)


@q(
    "u3_tombstone_preview",
    f"""SELECT o_orderkey, -(1000000 + row_number() OVER (ORDER BY o_orderkey)) AS new_version
        FROM (SELECT o_orderkey, {_VERSION_SQL} AS version FROM orders)
        WHERE version >= 0 AND o_orderkey % 23 = 0""",
)
def u3_tombstone_preview(spark, sf_dir):
    """U3: tombstone delete, set form — live rows matching the delete
    predicate get the *negated* next versions (deleteInternal
    :316-330).  Dense sequential stamping here (the engine's
    _stamp_versions is bucket-parallel; the oracle needs a total
    order, so this preview stamps by key order)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").withColumn("version", _version_col())
    hit = live_view(o).filter(F.col("o_orderkey") % 23 == 0)
    w = Window.orderBy("o_orderkey")
    return hit.select(
        "o_orderkey",
        (-(F.lit(1000000) + F.row_number().over(w))).cast("long").alias("new_version"),
    )


@q(
    "pipeline_chunk_docs",
    """WITH toks AS (SELECT doc_id,
                            list_filter(string_split(text, ' '), x -> x <> '') AS t
                     FROM documents),
            c AS (SELECT doc_id, i AS chunk_index,
                         t[CAST(i*32+1 AS INT):CAST(i*32+40 AS INT)] AS ct
                  FROM toks,
                       UNNEST(range(0, CAST(ceil(greatest(len(t)-8, 1)/32.0) AS BIGINT))) r(i))
       SELECT doc_id, CAST(chunk_index AS BIGINT) AS chunk_index,
              array_to_string(ct, ' ') AS chunk_text,
              CAST(len(ct) AS BIGINT) AS n_tokens
       FROM c WHERE len(ct) > 0""",
)
def pipeline_chunk_docs(spark, sf_dir):
    """Context-length chunking: 40-token windows with 8-token overlap
    (stride 32) per document — the pretraining chunking step as a
    stateless map-side explode (text.chunk_documents)."""
    d = load_table(spark, sf_dir, "documents")
    out = textf.chunk_documents(d, "doc_id", "text", max_tokens=40, overlap=8)
    return out.select(
        "doc_id",
        F.col("chunk_index").cast("long").alias("chunk_index"),
        "chunk_text",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


@q(
    "p3_null_probe",
    """SELECT o_orderkey, o_totalprice FROM
       (SELECT o_orderkey, o_totalprice, nullif(o_orderstatus, 'P') AS statusN
        FROM orders)
       WHERE statusN IS NULL""",
)
def p3_null_probe(spark, sf_dir):
    """P3: IS NULL key probe through the find surface — a None key
    renders as isNull() (DatabaseExecutorForMysqlClient.java:94)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "statusN", F.expr("nullif(o_orderstatus, 'P')")
    )
    return indexed_find(o, ["statusN"], [None]).select("o_orderkey", "o_totalprice")


@q(
    "f4_flags",
    """SELECT id,
              CASE WHEN length = -1 THEN 1 ELSE 0 END AS is_dir,
              CASE WHEN holder IS NOT NULL THEN 1 ELSE 0 END AS under_construction
       FROM (SELECT o_orderkey AS id,
                    CASE WHEN o_orderkey % 10 = 0 THEN -1 ELSE o_orderkey END AS length,
                    CASE WHEN o_orderstatus = 'P' THEN 'w' END AS holder
             FROM orders)""",
)
def f4_flags(spark, sf_dir):
    """F4: isDir / isUnderConstruction flag projections
    (File.java:144-150) over a file-shaped fixture."""
    from adfs_spark.functions.scalar import is_dir, is_under_construction

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 10 == 0, -1)
        .otherwise(F.col("o_orderkey"))
        .cast("long")
        .alias("length"),
        F.when(F.col("o_orderstatus") == "P", "w").alias("holder"),
    )
    return o.select(
        "id",
        is_dir(F.col("length")).cast("long").alias("is_dir"),
        is_under_construction(F.col("holder")).cast("long").alias("under_construction"),
    )


@q(
    "f5_name_guard",
    """SELECT n_nationkey,
              CASE WHEN name_test IS NOT NULL AND len(name_test) > 0
                        AND len(name_test) <= 255 THEN 1 ELSE 0 END AS valid
       FROM (SELECT n_nationkey,
                    CASE WHEN n_nationkey % 5 = 0 THEN ''
                         WHEN n_nationkey % 7 = 0 THEN NULL
                         ELSE n_name END AS name_test
             FROM nation)""",
)
def f5_name_guard(spark, sf_dir):
    """F5: name validation guard (FileRepository.find :110-119 — name
    non-null, non-empty, ≤255 chars)."""
    from adfs_spark.functions.scalar import valid_name

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 5 == 0, "")
        .when(F.col("n_nationkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("n_name"))
        .alias("name_test"),
    )
    return n.select(
        "n_nationkey", valid_name(F.col("name_test")).cast("long").alias("valid")
    )


@q(
    "f6_update_flags",
    """SELECT o_orderkey,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 100 AS DOUBLE) AS inc,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) - 50 AS DOUBLE) AS dec
       FROM orders WHERE o_orderkey % 13 = 0""",
)
def f6_update_flags(spark, sf_dir):
    """F6: ADD/SUB update-flag arithmetic (TDHSCommon.UpdateFlag
    :80-95) as set-based update previews."""
    from adfs_spark.functions.scalar import counter_add

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    price = _dec("o_totalprice")
    return o.select(
        "o_orderkey",
        counter_add(price, F.lit(100)).cast("double").alias("inc"),
        counter_add(price, F.lit(-50)).cast("double").alias("dec"),
    )


@q(
    "u5_id_alloc",
    """SELECT o_orderkey,
              (SELECT max(o_orderkey) FROM orders)
                + row_number() OVER (ORDER BY o_orderkey) AS new_id
       FROM orders WHERE o_orderkey % 501 = 0""",
)
def u5_id_alloc(spark, sf_dir):
    """U5: collision-free id allocation, set form — max(id) + dense
    rank for a batch of inserts (replaces the reference's random-probe
    loop, FileRepository.getUniqueIdAndLock :307-374).  The window runs
    over the (small) insert batch only, never the table."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey").alias("_mx"))
    batch = o.filter(F.col("o_orderkey") % 501 == 0)
    return (
        batch.join(F.broadcast(mx))
        .withColumn(
            "new_id",
            (F.col("_mx") + F.row_number().over(Window.orderBy("o_orderkey"))).cast(
                "long"
            ),
        )
        .select("o_orderkey", "new_id")
    )


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        if numeric:
            mn = f"CAST(MIN({c}) AS DOUBLE) AS min_num, CAST(MAX({c}) AS DOUBLE) AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
        else:
            mn = f"CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, CAST(MIN({c}) AS VARCHAR) AS min_str, CAST(MAX({c}) AS VARCHAR) AS max_str"
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT({c}) AS n_nonnull, "
            f"COUNT(*) - COUNT({c}) AS n_null, COUNT(DISTINCT {c}) AS n_distinct, {mn} FROM orders"
        )
    return "\nUNION ALL\n".join(parts)


@q("dq_profile_orders", _profile_oracle())
def dq_profile_orders(spark, sf_dir):
    """Column profiling (functions/audit.profile_columns): per-column
    null/distinct counts and min/max from ONE aggregation pass — the
    lake-side stand-in for the reference's InnoDB index statistics."""
    from adfs_spark.functions.audit import profile_columns

    o = load_table(spark, sf_dir, "orders")
    return profile_columns(o, [c for c, _ in _PROFILE_COLS])


@q(
    "dq_pk_dupes",
    """WITH planted AS (
         SELECT o_orderkey FROM orders
         UNION ALL
         SELECT o_orderkey FROM orders WHERE o_orderkey % 997 = 0
       )
       SELECT o_orderkey, COUNT(*) AS n_dup
       FROM planted GROUP BY o_orderkey HAVING COUNT(*) > 1""",
)
def dq_pk_dupes(spark, sf_dir):
    """UNIQUE-key audit (audit.pk_duplicates) over a corpus with
    planted duplicates (the fixture itself is clean — same pattern as
    dedup_exact_groups): the batch form of the reference's UNIQUE index
    rejection (insertInternal :281-296).  One groupBy shuffle."""
    from adfs_spark.functions.audit import pk_duplicates

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    planted = o.unionByName(o.filter(F.col("o_orderkey") % 997 == 0))
    return pk_duplicates(planted, ["o_orderkey"])


@q(
    "dq_fk_orphans",
    """WITH child AS (
         SELECT l_orderkey + CASE WHEN l_orderkey % 97 = 0 THEN 100000000 ELSE 0 END AS l_orderkey
         FROM lineitem
       )
       SELECT l_orderkey, COUNT(*) AS n_rows
       FROM child
       WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
       GROUP BY l_orderkey""",
)
def dq_fk_orphans(spark, sf_dir):
    """Referential-integrity audit (audit.fk_orphans) with planted
    orphans: child keys shifted out of the parent domain for 1/97 of
    rows (lineitem→orders is valid in the fixture).  The anti-join is
    the same shape as J5's "reported but unknown" class; at 100 TB it
    broadcasts when the parent is a dimension."""
    from adfs_spark.functions.audit import fk_orphans

    li = load_table(spark, sf_dir, "lineitem").select(
        (
            F.col("l_orderkey")
            + F.when(F.col("l_orderkey") % 97 == 0, F.lit(100000000)).otherwise(0)
        ).alias("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    return fk_orphans(li, o, ["l_orderkey"], ["o_orderkey"])


@q(
    "pipeline_decontaminate",
    """WITH toks AS (
         SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
         FROM documents
       ),
       sh AS (
         SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         FROM toks, UNNEST(range(1, greatest(len(t)-2, 1)+1)) AS r(i)
       ),
       ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 53 = 0)
       SELECT doc_id, count(*) AS n_hits
       FROM sh JOIN ev USING (s)
       WHERE doc_id % 53 <> 0
       GROUP BY doc_id""",
)
def pipeline_decontaminate(spark, sf_dir):
    """Test-set decontamination (dedup.contamination_hits): per train
    document, distinct 3-gram overlap with a held-out eval slice
    (doc_id % 53).  Eval shingles broadcast; one groupBy shuffle."""
    from adfs_spark.functions.dedup import contamination_hits

    d = load_table(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 53 == 0)
    train = d.filter(F.col("doc_id") % 53 != 0)
    return contamination_hits(train, ev, n=3)


@q(
    "pipeline_lm_score",
    """WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         FROM documents),
       model AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       total AS (SELECT count(*) AS n FROM toks)
       SELECT doc_id, count(*) AS n_tokens,
              round(avg(ln(c) - ln(n)), 6) AS avg_logprob
       FROM toks JOIN model USING (tok), total
       GROUP BY doc_id""",
)
def pipeline_lm_score(spark, sf_dir):
    """Unigram-LM quality scoring (text.unigram_logprob): mean token
    log-probability under a corpus-trained unigram model — the
    deterministic reduction of CCNet's perplexity filter."""
    from adfs_spark.functions.text import unigram_logprob

    d = load_table(spark, sf_dir, "documents")
    s = unigram_logprob(d)
    return s.select("doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob"))


@q(
    "agg_grouping_sets",
    """SELECT o_orderstatus AS gs_status, o_orderpriority AS gs_priority,
              count(*) AS n_orders
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
)
def agg_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS (the grouping shape ROLLUP/CUBE don't
    express: disjoint marginals + grand total in one pass).  Plans as
    a single Expand + one shuffle, same as the rollup family."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """SELECT o_orderstatus AS gs_status, o_orderpriority AS gs_priority,
                  count(*) AS n_orders
           FROM _gs_orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
    )


@q(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
       GROUP BY c_custkey, c_name
       ORDER BY revenue DESC, c_custkey
       LIMIT 20""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top 20.  Fact⋈fact join on the shared orderkey (AQE decides the
    strategy), decimal-exact revenue, TakeOrderedAndProject top-k with
    a deterministic tie-break."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            _dsum4(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                longsum=_fits_longsum(sf_dir),
            )
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "events_hourly_unique_users",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
              count(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1""",
)
def events_hourly_unique_users(spark, sf_dir):
    """Hourly distinct-user counts — the unique-visitors twin of the
    hourly event counts (two-phase distinct: map-side dedupe per
    (hour, user), then count; plan-tested shape)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@q(
    "h_du_rollup",
    f"""WITH RECURSIVE ns AS ({_NS_SQL}),
       anc AS (
         SELECT id AS node, parentId AS anc FROM ns
         UNION ALL
         SELECT a.node, f.parentId
         FROM anc a JOIN ns f ON a.anc = f.id
         WHERE a.anc <> 0
       ),
       sizes AS (SELECT 10000 + c_custkey AS node,
                        CAST(c_acctbal AS DECIMAL(18,2)) AS sz
                 FROM customer)
       SELECT anc AS id, count(*) AS n_files,
              CAST(sum(sz) AS DOUBLE) AS total_size
       FROM anc JOIN sizes USING (node)
       GROUP BY anc""",
)
def h_du_rollup(spark, sf_dir):
    """All-directories du (hierarchy.rollup_sizes): per-node total
    account balance + leaf count for EVERY tree node in one pass —
    the batch-analytics form of per-path getContentSummary
    (FSNamesystem.java:1462-1473)."""
    from adfs_spark.operators.hierarchy import rollup_sizes

    ns = _namespace(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    sizes = c.select(
        (F.col("c_custkey") + 10000).cast("long").alias("id"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("size"),
    )
    out = rollup_sizes(ns, sizes)
    return out.select(
        "id", "n_files", F.col("total_size").cast("double").alias("total_size")
    )


@q(
    "events_funnel",
    """WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = 'signup' GROUP BY 1),
            s1 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s0 USING (user_id)
                   WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
       SELECT 'signup' AS step, 0 AS step_index, count(*) AS n_users FROM s0
       UNION ALL
       SELECT 'view', 1, count(*) FROM s1
       UNION ALL
       SELECT 'click', 2, count(*) FROM s2
       UNION ALL
       SELECT 'purchase', 3, count(*) FROM s3""",
)
def events_funnel(spark, sf_dir):
    """Strictly-ordered conversion funnel (functions/events.funnel_counts):
    signup → view → click → purchase, each step anchored after the
    user's earliest qualifying previous step."""
    from adfs_spark.functions.events import funnel_counts

    e = load_table(spark, sf_dir, "events")
    return funnel_counts(e, ["signup", "view", "click", "purchase"])


@q(
    "events_retention",
    """WITH first AS (SELECT user_id, min(ts) AS f FROM events GROUP BY 1)
       SELECT strftime(date_trunc('week', f), '%Y-%m-%d') AS cohort_week,
              date_diff('day', CAST(f AS DATE), CAST(e.ts AS DATE)) // 7 AS week_offset,
              count(DISTINCT e.user_id) AS n_active
       FROM events e JOIN first USING (user_id)
       GROUP BY 1, 2""",
)
def events_retention(spark, sf_dir):
    """Weekly retention triangle (functions/events.retention_cohorts):
    cohort by first-seen week, count distinct actives per week offset."""
    from adfs_spark.functions.events import retention_cohorts

    e = load_table(spark, sf_dir, "events")
    return retention_cohorts(e)


@q(
    "pipeline_shuffle_order",
    """SELECT doc_id,
              row_number() OVER (
                ORDER BY md5(CAST(doc_id AS VARCHAR) || 'epoch0'), doc_id
              ) AS train_order
       FROM documents""",
)
def pipeline_shuffle_order(spark, sf_dir):
    """Deterministic training-order shuffle (sampling.shuffle_order):
    every engine and re-run agrees on the epoch permutation.  Ranked
    without a single-partition window (two-pass offset numbering)."""
    from adfs_spark.functions.sampling import shuffle_order

    d = load_table(spark, sf_dir, "documents")
    return shuffle_order(d, "doc_id").select("doc_id", "train_order")


@q(
    "dq_heavy_hitters",
    """SELECT CAST(l_suppkey AS VARCHAR) AS item, COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY n DESC, item LIMIT 20""",
)
def dq_heavy_hitters(spark, sf_dir):
    """Heavy-hitter detection (audit.heavy_hitters, exact tier): the
    top-20 hottest lineitem supplier keys — the skew-diagnosis query
    run before choosing a join strategy.  One groupBy +
    TakeOrderedAndProject; the approx_top_k sketch tier is
    pytest-verified against this."""
    from adfs_spark.functions.audit import heavy_hitters

    li = load_table(spark, sf_dir, "lineitem")
    return heavy_hitters(li, "l_suppkey", k=20)


_BLOCKED_DOMAINS = ("src3.example.com", "src7.example.com", "src12.example.com")


_BLOCKED_SQL = ", ".join(f"'{b}'" for b in _BLOCKED_DOMAINS)


@q(
    "pipeline_url_filter",
    f"""WITH u AS (
         SELECT doc_id,
                'https://' || source || '.example.com/' || CAST(doc_id AS VARCHAR) AS url
         FROM documents),
       d AS (SELECT doc_id,
                    regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS domain
             FROM u)
       SELECT domain, count(*) AS n_docs FROM d
       WHERE domain NOT IN ({_BLOCKED_SQL})
       GROUP BY domain""",
)
def pipeline_url_filter(spark, sf_dir):
    """Domain blocklist filtering (text.extract_domain +
    domain_blocklist_filter): URL host extraction, broadcast anti-join
    against the blocklist, per-domain survivor counts."""
    from adfs_spark.functions.text import domain_blocklist_filter

    d = load_table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/"), F.col("doc_id").cast("string")),
    )
    blocked = spark.createDataFrame([(b,) for b in _BLOCKED_DOMAINS], "domain: string")
    kept = domain_blocklist_filter(d, "url", blocked)
    return kept.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))


@q(
    "pipeline_quality_rules",
    """WITH toks AS (
         SELECT source,
                list_filter(string_split(text, ' '), x -> x <> '') AS tw,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS tl,
                CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1) AS punct
         FROM documents),
       flags AS (
         SELECT source,
                coalesce(len(tw) BETWEEN 50 AND 100000, FALSE) AS word_count,
                coalesce((CAST(list_sum(list_transform(tw, x -> length(x))) AS DOUBLE)
                   / greatest(len(tw), 1)) BETWEEN 3.0 AND 10.0, FALSE) AS mean_word_len,
                coalesce(punct <= 0.1, FALSE) AS symbol_ratio,
                coalesce(CAST(len(list_filter(tw, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                   / greatest(len(tw), 1) >= 0.80, FALSE) AS alpha_words,
                coalesce(len(list_intersect(tl, ['the','a','data','row'])) >= 2,
                  FALSE) AS stopwords
         FROM toks),
       withpass AS (
         SELECT *, (word_count AND mean_word_len AND symbol_ratio
                    AND alpha_words AND stopwords) AS pass_all
         FROM flags),
       longf AS (
         SELECT source, rule, passed
         FROM withpass
         UNPIVOT (passed FOR rule IN (word_count, mean_word_len, symbol_ratio,
                                      alpha_words, stopwords, pass_all)))
       SELECT source, rule,
              sum(CASE WHEN passed THEN 0 ELSE 1 END) AS n_failed,
              sum(CASE WHEN passed THEN 1 ELSE 0 END) AS n_passed
       FROM longf GROUP BY source, rule""",
)
def pipeline_quality_rules(spark, sf_dir):
    """Gopher-rule document filter report (text.gopher_rule_failures):
    per (source, rule) pass/fail counts for the published Gopher A1.1
    quality rules — word-count band, mean-word-length band, symbol
    ratio, alpha-word fraction, required stopwords — plus the
    ``pass_all`` conjunction.  One let-bound tokenization pass, one
    map-side stack unpivot, one groupBy; the oracle recomputes every
    rule relationally (cross-engine parity on the rule booleans
    themselves).

    The stopword list is fixture-calibrated (the synthetic corpus has
    no English function words beyond 'the'/'a', so Gopher's published
    list would fail EVERY document — a vacuous value check, same
    reasoning as the 0.45 cosine threshold in
    ``sim_embedding_neardup_exact``); the published list stays the
    library default."""
    from adfs_spark.functions.text import gopher_rule_failures

    d = load_table(spark, sf_dir, "documents")
    return gopher_rule_failures(
        d, "text", "source", required_stopwords=("the", "a", "data", "row")
    )


@q(
    "dedup_canonical_survivors",
    f"""WITH RECURSIVE {_LSH_SIG_SQL},
       vs AS (SELECT v.vec_id, v.e, sig.s FROM v JOIN sig USING (vec_id)),
       prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.e AS ea, b.e AS eb
               FROM vs a JOIN vs b ON a.s = b.s AND a.vec_id < b.vec_id),
       e2 AS (SELECT id_a, id_b FROM prs
              WHERE list_dot_product(ea, eb)
                    / (sqrt(list_dot_product(ea, ea)) * sqrt(list_dot_product(eb, eb))) >= 0.3),
       sym AS (SELECT id_a AS u, id_b AS v FROM e2
               UNION SELECT id_b, id_a FROM e2),
       reach(u, v) AS (SELECT u, v FROM sym
                       UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       comp AS (SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u),
       sc AS (SELECT doc_id AS node,
                     CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                          AS DOUBLE) AS score
              FROM documents),
       j AS (SELECT c.component, c.node, s.score FROM comp c JOIN sc s USING (node)),
       r AS (SELECT component, node,
                    row_number() OVER (PARTITION BY component
                                       ORDER BY score DESC, node ASC) AS rn,
                    count(*) OVER (PARTITION BY component) AS n
             FROM j)
       SELECT component, node AS survivor_id, n AS n_members, n - 1 AS n_dropped
       FROM r WHERE rn = 1""",
)
def dedup_canonical_survivors(spark, sf_dir):
    """The shipping step of a dedup pipeline (dedup.canonical_survivors):
    near-dup pairs → connected components → ONE canonical survivor per
    cluster, chosen as the member with the most tokens (ties toward the
    smallest id).  Same deterministic-LSH pair plane as
    ``dedup_components``; the argmax runs inside the component
    aggregate (``max_by`` over a (score, -id) struct — one shuffle, no
    window), which is skew-free because near-dup clusters are tiny."""
    from adfs_spark.functions.dedup import canonical_survivors
    from adfs_spark.functions.text import whitespace_tokens

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    lsh = sim.DeterministicHyperplaneLSH(dim=64, num_bits=8, salt="lsh")
    pairs = sim.embedding_near_duplicates(e, dim=64, threshold=0.3, lsh=lsh)
    scores = d.select(
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).cast("double").alias("score"),
    )
    return canonical_survivors(
        pairs.select("id_a", "id_b"), scores, id_col="doc_id", score_col="score"
    )


@q(
    "dedup_canonical_survivors_spanning",
    """WITH RECURSIVE
       planes AS (
         SELECT t, b, d,
                CAST((('0x' || substring(md5(
                         CASE WHEN t = 0 THEN 'lsh' ELSE 'lsh~t1' END
                         || '_' || b || '_' || d), 1, 8))::BIGINT % 16) - 8
                     AS DOUBLE) AS w
         FROM range(0, 2) tt(t), range(0, 10) t1(b), range(0, 64) t2(d)),
       plist AS (SELECT t, b, list(w ORDER BY d) AS p FROM planes GROUP BY t, b),
       v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
             FROM embeddings),
       sig AS (
         SELECT t, vec_id,
                sum(CASE WHEN list_dot_product(v.e, plist.p) >= 0
                         THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS s
         FROM v, plist GROUP BY t, vec_id),
       hubs AS (SELECT t, s, min(vec_id) AS hub FROM sig GROUP BY t, s),
       e2 AS (SELECT DISTINCT h.hub AS id_a, g.vec_id AS id_b
              FROM sig g JOIN hubs h ON g.t = h.t AND g.s = h.s
              WHERE g.vec_id <> h.hub),
       sym AS (SELECT id_a AS u, id_b AS v FROM e2
               UNION SELECT id_b, id_a FROM e2),
       reach(u, v) AS (SELECT u, v FROM sym
                       UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       comp AS (SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u),
       sc AS (SELECT doc_id AS node,
                     CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                          AS DOUBLE) AS score
              FROM documents),
       j AS (SELECT c.component, c.node, s.score FROM comp c JOIN sc s USING (node)),
       r AS (SELECT component, node,
                    row_number() OVER (PARTITION BY component
                                       ORDER BY score DESC, node ASC) AS rn,
                    count(*) OVER (PARTITION BY component) AS n
             FROM j)
       SELECT component, node AS survivor_id, n AS n_members, n - 1 AS n_dropped
       FROM r WHERE rn = 1""",
)
def dedup_canonical_survivors_spanning(spark, sf_dir):
    """The at-scale form of the keep-step, hash-checked (r7 verdict ask
    #3): spanning-STAR candidate edges (similarity.
    embedding_candidate_star — per-bucket hub→member, O(docs × tables)
    edges for ANY dup-family size) over TWO salted deterministic LSH
    planes, glued by connected components, then the same
    canonical-survivor argmax as ``dedup_canonical_survivors``.

    The star's components are provably identical to the all-pairs
    bucket graph's (per bucket both span the same node set), so the
    oracle recomputes the clique form: same md5 planes, all intra-
    bucket pairs expressed as hub joins, recursive-CTE closure, window
    argmax.  This row pins exactly what ``spanning=True`` changes —
    candidate emission and cross-table gluing; the per-edge cosine
    verification it composes with is pinned by the all-pairs row and
    the planted-family recall gate in bench.

    10 signature bits at this corpus size keeps the cross-plane union
    sub-percolation (components stay dup-family-sized); the production
    spanning path needs no such tuning because verified edges prune
    false candidates before any closure."""
    from adfs_spark.functions.dedup import canonical_survivors
    from adfs_spark.functions.text import whitespace_tokens

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    tables = [
        sim.DeterministicHyperplaneLSH(dim=64, num_bits=10, salt="lsh"),
        sim.DeterministicHyperplaneLSH(dim=64, num_bits=10, salt="lsh~t1"),
    ]
    edges = sim.embedding_candidate_star(
        e, id_col="vec_id", vec_col="embedding", lsh_tables=tables
    )
    scores = d.select(
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).cast("double").alias("score"),
    )
    return canonical_survivors(
        edges, scores, id_col="doc_id", score_col="score"
    )


@q(
    "pipeline_ccnet_buckets",
    """WITH toks AS (
         SELECT doc_id,
                unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         FROM documents),
       model AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       total AS (SELECT count(*) AS n FROM toks),
       lp AS (SELECT doc_id, round(avg(ln(c) - ln(n)), 5) AS lp
              FROM toks JOIN model USING (tok), total
              GROUP BY doc_id),
       t AS (SELECT d.doc_id, d.lang, lp.lp,
                    ntile(3) OVER (PARTITION BY d.lang
                                   ORDER BY lp.lp DESC, d.doc_id) AS tile
             FROM documents d JOIN lp USING (doc_id))
       SELECT doc_id, lang,
              CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket,
              lp
       FROM t""",
)
def pipeline_ccnet_buckets(spark, sf_dir):
    """CCNet per-language quality tiers (text.ccnet_buckets, Wenzek et
    al. 2020): corpus unigram-LM score per document, then ntile(3)
    within each language — head reads most like the corpus, tail is the
    word-salad end.  Scores are rounded BEFORE ranking with an id
    tiebreak, so tier assignment is engine-reproducible; the oracle
    recomputes the whole estimator relationally."""
    from adfs_spark.functions.text import ccnet_buckets

    d = load_table(spark, sf_dir, "documents")
    return ccnet_buckets(d).select("doc_id", "lang", "bucket", "lp")


@q(
    "corpus_report",
    """WITH fp AS (SELECT source, lang, md5(text) AS f,
                          len(list_filter(string_split(text, ' '), x -> x <> ''))
                            AS nt
                   FROM documents),
       dups AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 1)
       SELECT source,
              count(*) AS n_docs,
              sum(nt) AS total_tokens,
              sum(CASE WHEN f IN (SELECT f FROM dups) THEN 1 ELSE 0 END)
                AS n_dup_docs,
              count(DISTINCT lang) AS n_langs
       FROM fp GROUP BY source""",
)
def corpus_report(spark, sf_dir):
    """One-stop corpus audit: per source, document count, total token
    mass, exact-duplicate document count (corpus-wide md5 groups), and
    language spread — the summary table a data curation run publishes.
    Two shuffles total: the corpus-wide fingerprint groupBy and the
    per-source aggregate (duplicate flags ride a broadcast semi-join of
    the small >1 fingerprint set)."""
    from adfs_spark.functions.text import md5_fingerprint, whitespace_tokens

    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "source",
        "lang",
        md5_fingerprint(F.col("text")).alias("f"),
        F.size(whitespace_tokens(F.col("text"))).alias("nt"),
    )
    dups = (
        fp.groupBy("f")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("f")
    )
    flagged = fp.join(F.broadcast(dups).withColumn("_dup", F.lit(1)), "f", "left")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("total_tokens"),
        F.sum(F.when(F.col("_dup").isNotNull(), 1).otherwise(0)).alias("n_dup_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )


@q("dedup_semantic", _NEARDUP_SQL)
def dedup_semantic(spark, sf_dir):
    """SemDeDup (similarity.semantic_duplicate_pairs), full path:
    k-means centroid training → cell assignment → intra-cell pair
    generation → exact cosine verify.  Run with a SINGLE cluster so
    every pair is intra-cell and the result is exactly the all-pairs
    threshold pairs — the same oracle trick ``sim_ivf_topk`` uses
    (probe-all ≡ brute force); cluster-bounded recall is pinned by the
    planted-duplicates pytest and machine-recorded per bench run
    (``semdedup_stats``)."""
    from adfs_spark.functions.similarity import kmeans_train, semantic_duplicate_pairs

    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_train(e, k=1, iters=1)
    pairs = semantic_duplicate_pairs(e, threshold=0.45, centroids=cents)
    return pairs.select("id_a", "id_b", F.round("sim", 5).alias("sim"))


@q(
    "s_warc_roundtrip",
    """SELECT 'https://' || source || '.example.com/' || CAST(doc_id AS VARCHAR)
             AS target_uri,
            length(text) AS n_chars
       FROM documents WHERE doc_id % 5 = 0""",
)
def s_warc_roundtrip(spark, sf_dir):
    """WARC (ISO 28500) export→ingest roundtrip on the REAL source
    path (sources/warc.py): a deterministic document slice is written
    as member-per-record .warc.gz archives (one per partition, the
    Common Crawl layout) by the distributed writer, then re-read
    through the binaryFile + streaming-parser reader; the oracle is
    the same slice straight off the relational table.  Proves header
    serialization, per-member gzip framing, the chunked record
    splitter, and payload integrity end-to-end."""
    from adfs_spark.sources.warc import read_warc, write_warc

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    src = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
        ).alias("uri"),
        F.col("text"),
    )
    out = _tmp_root("adfs_warc_")
    write_warc(src, out, uri_col="uri", payload_col="text")
    rec = read_warc(spark, out)
    return rec.select(
        "target_uri", F.length(F.col("payload").cast("string")).alias("n_chars")
    )


@q(
    "s_jsonl_roundtrip",
    """SELECT doc_id, lang, length(text) AS n_chars
       FROM documents WHERE doc_id % 7 = 0""",
)
def s_jsonl_roundtrip(spark, sf_dir):
    """JSON-lines export→ingest roundtrip on the real source path
    (sources/generic.py::write_jsonl + read_jsonl_quarantine): a
    deterministic document slice is written as gzipped JSONL by the
    distributed writer, re-read through the PERMISSIVE quarantine
    reader (zero quarantined rows on clean data — the planted-garbage
    path is pytest-pinned), and compared against the same slice off the
    relational table.  Proves schema-on-read typing, line framing, and
    compression round-tripping."""
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.sources.generic import read_jsonl_quarantine, write_jsonl

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    out = _tmp_root("adfs_jsonl_")
    write_jsonl(d.select("doc_id", "lang", "text"), out)
    spec = TableSpec(
        name="docs_jsonl",
        columns=(
            ColumnSpec("doc_id", "long"),
            ColumnSpec("lang", "string"),
            ColumnSpec("text", "string"),
        ),
        primary_key=("doc_id",),
    )
    good, quarantine = read_jsonl_quarantine(
        spark, spec, out, register=_persist_tracked
    )
    # explicit raise (not assert): the zero-quarantine invariant must
    # survive `python -O`, which compiles asserts out of the bench path
    if quarantine.limit(1).count() != 0:
        raise RuntimeError(
            "jsonl roundtrip produced quarantine rows from clean input"
        )
    return good.select("doc_id", "lang", F.length("text").alias("n_chars"))


_BM25_TERMS = ("table", "scan", "merge")


def _bm25_oracle_sql(terms: tuple[str, ...], k1: float = 1.2, b: float = 0.75) -> str:
    tf = ", ".join(
        f"len(list_filter(t, x -> x = '{q}')) AS tf{i}" for i, q in enumerate(terms)
    )
    dfc = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln(1.0 + (N - df{i} + 0.5)/(df{i} + 0.5))"
        f" * (tf{i} * ({k1} + 1.0))"
        f" / (tf{i} + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    return f"""WITH toks AS (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '') AS t
                FROM documents),
         d AS (SELECT doc_id, len(t) AS dl, {tf} FROM toks),
         stats AS (SELECT count(*) AS N, avg(dl) AS avgdl, {dfc} FROM d)
       SELECT doc_id, round({score}, 5) AS bm25 FROM d, stats"""


@q("pipeline_bm25_rank", _bm25_oracle_sql(_BM25_TERMS))
def pipeline_bm25_rank(spark, sf_dir):
    """Okapi BM25 relevance of every document to a fixed query term
    set (text.bm25_scores) — the lexical-retrieval primitive beside
    the ANN tier.  One scan builds per-doc (tf vector, length) from a
    single named token array; a 1-row aggregate carries N/avgdl/df;
    scoring is the tf vector × broadcast stats, fully map-side — zero
    data-row shuffles at any corpus size.  The oracle recomputes the
    whole model (idf, length norm, smoothing) relationally."""
    from adfs_spark.functions.text import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    return bm25_scores(d, _BM25_TERMS).select(
        "doc_id", F.round("bm25", 5).alias("bm25")
    )


@q(
    "pipeline_dsir_weights",
    """WITH toks AS (SELECT doc_id, source,
                            list_filter(string_split(text, ' '), x -> x <> '') AS t
                     FROM documents),
         grams AS (SELECT doc_id, source,
                          ('0x' || substring(md5(array_to_string(t[i:i+1], ' ')), 1, 8))::BIGINT
                            % 10000 AS bucket
                   FROM toks, UNNEST(range(1, greatest(len(t)-1, 1)+1)) r(i)),
         tc AS (SELECT bucket, count(*) AS tc FROM grams
                WHERE source IN ('src0', 'src1') GROUP BY 1),
         rc AS (SELECT bucket, count(*) AS rc FROM grams GROUP BY 1),
         tot AS (SELECT (SELECT coalesce(sum(tc), 0) FROM tc) AS T,
                        (SELECT coalesce(sum(rc), 0) FROM rc) AS R),
         ratio AS (SELECT b.b AS bucket,
                          ln((coalesce(tc.tc, 0) + 1.0) / (tot.T + 10000))
                            - ln((coalesce(rc.rc, 0) + 1.0) / (tot.R + 10000)) AS logratio
                   FROM range(0, 10000) b(b)
                   LEFT JOIN tc ON tc.bucket = b.b
                   LEFT JOIN rc ON rc.bucket = b.b, tot)
       SELECT g.doc_id, round(sum(ratio.logratio), 5) AS logweight
       FROM grams g JOIN ratio ON ratio.bucket = g.bucket
       GROUP BY g.doc_id""",
)
def pipeline_dsir_weights(spark, sf_dir):
    """DSIR importance weights (selection.bucket_logratio +
    dsir_logweight; Xie et al. 2023, arXiv:2302.03169): hashed-bigram
    bag-of-buckets models for a target domain (sources src0/src1) and
    the full raw corpus, add-one smoothed, and the per-document
    ``Σ count·(log p̂_target − log p̂_raw)`` score every raw document
    would be resampled by.  The exploded (doc, bucket) occurrence
    frame is computed ONCE and persisted — the raw model, the target
    model (a filter of it), and the scoring pass all share it, so the
    corpus is tokenized+hashed a single time; the only other work is
    two 10k-row groupBys and one partially-aggregated shuffle on
    doc_id.  The oracle recomputes the full estimator — portable md5
    bucket ids, smoothing, and all — relationally."""
    from adfs_spark.functions.selection import (
        bucket_logratio,
        dsir_logweight,
        ngram_bucket_rows,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = _persist_tracked(ngram_bucket_rows(d, ("doc_id", "source"), "text"))
    ratio = bucket_logratio(
        None,
        None,
        target_rows=rows.filter(F.col("source").isin("src0", "src1")),
        raw_rows=rows,
    )
    w = dsir_logweight(d, ratio, bucket_rows=rows.select("doc_id", "bucket"))
    return w.select("doc_id", F.round("logweight", 5).alias("logweight"))


# =========================================================================
# Round-3 members: real-write-path rows (S10/D3 sync, D5 editlog
# convergence), the F7 block-locations projection, and the IVF-PQ ANN
# tier — each driver-verified against a relational oracle.
# =========================================================================

_KV_BASE_SQL = """SELECT o_orderkey AS k,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
       FROM orders WHERE o_orderkey % 20 = 0"""


def _kv_spec():
    from adfs_spark.schema import ColumnSpec, TableSpec

    return TableSpec(
        name="kv_sync",
        columns=(ColumnSpec("k", "long"), ColumnSpec("v", "double")),
        primary_key=("k",),
        versioned=True,
    )


def _kv_base(spark, sf_dir) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        F.col("o_orderkey").alias("k"), _dec("o_totalprice").cast("double").alias("v")
    )


@q(
    "u_sync_roundtrip",
    f"""WITH base AS ({_KV_BASE_SQL}),
         final AS (SELECT k, CASE WHEN k % 60 = 0 THEN v + 111.0 ELSE v END AS v
                   FROM base WHERE k % 100 <> 0)
        SELECT 'incr' AS mode, k, v FROM final
        UNION ALL
        SELECT 'full', k, v FROM final""",
)
def u_sync_roundtrip(spark, sf_dir):
    """S10/D3 on the REAL write path: a master VersionedTable is
    seeded, a replica full-restores from it, the master mutates
    (masked update + tombstone delete), the replica catches up via the
    version-range delta + idempotent LWW merge
    (restoreIncrementFromMasterServerInternal :677-716,
    MysqlServerController.getData :42-132), and a second replica
    full-restores the final state.  Both replicas' live views must
    equal the relational final state — the oracle never sees the
    tables, only the algebra they must converge to."""
    from adfs_spark.storage import VersionedTable

    spec = _kv_spec()
    root = _tmp_root("adfs_sync_")
    master = VersionedTable(spark, spec, os.path.join(root, "master"))
    master.init(_kv_base(spark, sf_dir))

    incr = VersionedTable(spark, spec, os.path.join(root, "incr"))
    incr.init()
    incr.sync_from(master)  # full-restore path (empty replica)

    master.update_where(F.col("k") % 60 == 0, {"v": F.col("v") + 111.0})
    master.delete_where(F.col("k") % 100 == 0)
    incr.sync_from(master)  # incremental delta path

    full = VersionedTable(spark, spec, os.path.join(root, "full"))
    full.init()
    full.sync_from(master)  # full-restore of the final state

    out_i = incr.live().select(F.lit("incr").alias("mode"), "k", "v")
    out_f = full.live().select(F.lit("full").alias("mode"), "k", "v")
    return out_i.unionByName(out_f)


@q(
    "d5_editlog_converged",
    f"""WITH base AS ({_KV_BASE_SQL})
        SELECT k, CASE WHEN k % 3 = 0 THEN v + 55.0 ELSE v END AS v
        FROM base WHERE k % 7 <> 0""",
)
def d5_editlog_converged(spark, sf_dir):
    """D5 as a driver row: the Structured-Streaming edit-log applier
    (DistributedEditLogger.java:83-116 semantics) tails a master's
    changelog (init + update + delete ops) and idempotently merges
    every micro-batch into a replica; after ``availableNow``
    convergence the replica's live view must equal the batch LWW
    result — the oracle is the pure relational final state, so the
    whole streaming loop (file source, micro-batching, at-least-once
    merge) is value-checked, not just row-counted."""
    from adfs_spark.storage import VersionedTable
    from adfs_spark.streaming.loops import replicate

    spec = _kv_spec()
    root = _tmp_root("adfs_d5_")
    master = VersionedTable(spark, spec, os.path.join(root, "master"))
    master.init(_kv_base(spark, sf_dir))
    master.update_where(F.col("k") % 3 == 0, {"v": F.col("v") + 55.0})
    master.delete_where(F.col("k") % 7 == 0)

    replica = VersionedTable(spark, spec, os.path.join(root, "replica"))
    replica.init()
    sq = replicate(master, replica, os.path.join(root, "ckpt"))
    sq.awaitTermination()
    return replica.live().select("k", "v")


@q(
    "d8_election_trace",
    """WITH ranked AS (
         SELECT n_name AS leader,
                CAST(n_regionkey AS BIGINT) AS leader_version,
                ROW_NUMBER() OVER (
                  ORDER BY n_regionkey DESC, n_nationkey ASC) AS epoch
         FROM nation)
       SELECT epoch, leader, leader_version
       FROM ranked WHERE epoch <= 5""",
)
def d8_election_trace(spark, sf_dir):
    """D8 as a driver row (r6 verdict ask #9): run the REAL election
    protocol — ElectionGroup on the in-memory object-store backend —
    over members derived from the nation table (one server per nation,
    dataVersion = n_regionkey, registration order = n_nationkey),
    through five crash-and-reelect rounds: the seated master
    unregisters (session drop), the NEED_RESTORE pool restores to
    SLAVE, survivors campaign and the next claimant steals the orphan
    lease with a fresh fencing token.

    The observed (epoch, leader, dataVersion) trace must equal the
    relational oracle: ``electMaster`` is max dataVersion then first
    created (DistributedManager.java:292-318), so the leader sequence
    is exactly the nation rows ranked by (version DESC, seq ASC), and
    epochs are dense 1..5 because each steal mints exactly ONE token
    (conditional-create reservation).  Value-checks the rule, the
    steal path, the restamp, and epoch monotonicity — the last
    pytest-only D8 behavior that is oracle-checkable.

    The 25-row collect is bounded protocol metadata, same class as
    every other protocol-row collect.
    """
    from adfs_spark.backend import MemoryCommitBackend
    from adfs_spark.election import ElectionGroup, ServerType

    nations = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .collect()
    )
    g = ElectionGroup(
        MemoryCommitBackend(), "svc", min_servers=1, election_delay=0.0
    )
    alive: dict[str, int] = {}
    for r in nations:
        g.register(r["n_name"], version=int(r["n_regionkey"]))
        alive[r["n_name"]] = int(r["n_regionkey"])
    trace = []
    for _round in range(5):
        for r in nations:
            if r["n_name"] in alive:
                g.campaign(r["n_name"])
        lead = g.leader()
        trace.append((g.epoch(), lead.name, int(lead.version)))
        # session drop: the master's ephemeral registration vanishes;
        # the lease it held is now verifiably stale (missing holder)
        g.unregister(lead.name)
        del alive[lead.name]
        # survivors finish restoring and re-enter the pool as SLAVE
        # (the reference's restore pipeline before a node can stand)
        for nm, ver in alive.items():
            g.register(nm, version=ver, server_type=ServerType.SLAVE)
    return spark.createDataFrame(
        trace, "epoch: long, leader: string, leader_version: long"
    )


@q(
    "f7_block_locations",
    """WITH reps AS (
         SELECT l_orderkey * 10 + l_linenumber AS block_id,
                l_orderkey AS file_id,
                l_linenumber AS file_index,
                (l_partkey + 7 * r) % 25 AS datanode_id,
                (l_partkey + 3 * r) % 11 AS gs,
                r AS version
         FROM lineitem, UNNEST([0, 1, 2]) t(r)
         WHERE l_orderkey % 500 = 0),
       primary_rep AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY block_id
                     ORDER BY gs DESC, version DESC, datanode_id DESC) AS rn
           FROM reps)
         WHERE rn = 1)
       SELECT p.block_id, p.file_id, p.file_index, p.datanode_id,
              n.n_name AS datanode_name
       FROM primary_rep p JOIN nation n ON n.n_nationkey = p.datanode_id""",
)
def f7_block_locations(spark, sf_dir):
    """F7, the getBlockLocations read path as one distributed plan
    (FSNamesystem.getBlockLocations :596-717,
    StateManager.adfsFileToHdfsFileStatus :844-848): replica rows →
    per-block primary-replica argmax (A2 on generationStamp, version)
    → datanode broadcast join (J2) → ordered (file, fileIndex)
    projection.  Replicas are synthesized 3-per-block from lineitem;
    datanodes are the nation dim."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    reps = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("block_id"),
        F.col("l_orderkey").alias("file_id"),
        F.col("l_linenumber").cast("long").alias("file_index"),
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"),
        F.col("l_partkey"),
    ).select(
        "block_id",
        "file_id",
        "file_index",
        ((F.col("l_partkey") + 7 * F.col("r")) % 25).cast("long").alias("datanode_id"),
        ((F.col("l_partkey") + 3 * F.col("r")) % 11).cast("long").alias("gs"),
        F.col("r").cast("long").alias("version"),
    )
    # datanode_id joins the sort key to make the argmax total: the
    # synthetic fixture has colliding (l_orderkey, l_linenumber) pairs,
    # so (gs, version) alone can tie across distinct replica rows
    primary = group_argmax(reps, ["block_id"], ["gs", "version", "datanode_id"])
    dn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("dn_id"),
        F.col("n_name").alias("datanode_name"),
    )
    located = fk_join(primary, dn, "datanode_id", "dn_id", broadcast_parent=True)
    return located.select(
        "block_id", "file_id", "file_index", "datanode_id", "datanode_name"
    )


@q(
    "d6_heartbeat_converged",
    """WITH hb AS (
         SELECT n_nationkey AS id, 1000 + w AS lastUpdated,
                CAST(n_nationkey * 1.5 + w AS DOUBLE) AS load
         FROM nation, UNNEST([0, 1, 2]) t(w)
         WHERE (w = 0) OR (w = 1 AND n_nationkey % 2 = 0)
            OR (w = 2 AND n_nationkey % 3 = 0))
       SELECT id, lastUpdated, load FROM (
         SELECT *, row_number() OVER (PARTITION BY id
                   ORDER BY lastUpdated DESC) AS rn FROM hb)
       WHERE rn = 1""",
)
def d6_heartbeat_converged(spark, sf_dir):
    """D6 as a driver row: the streaming heartbeat applier
    (updateDatanodeByDatanodeDescriptor :413-468) consumes three
    heartbeat waves through a file-source stream (one micro-batch per
    wave under availableNow) and upserts the per-datanode argmax into
    the datanode table; the converged live view must equal the
    relational latest-heartbeat-per-node — the whole streaming upsert
    loop is value-checked against a batch oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable
    from adfs_spark.streaming.loops import heartbeat_applier

    root = _tmp_root("adfs_d6_")
    hb_dir = os.path.join(root, "hb")
    os.makedirs(hb_dir)
    keys = [
        r["n_nationkey"]
        for r in load_table(spark, sf_dir, "nation").select("n_nationkey").collect()
    ]
    for w in range(3):
        ids = [k for k in keys if w == 0 or (w == 1 and k % 2 == 0) or (w == 2 and k % 3 == 0)]
        pq_.write_table(
            pa.table(
                {
                    "id": pa.array([int(i) for i in ids], pa.int64()),
                    "lastUpdated": pa.array([1000 + w] * len(ids), pa.int64()),
                    "load": pa.array([i * 1.5 + w for i in ids], pa.float64()),
                }
            ),
            os.path.join(hb_dir, f"wave{w}.parquet"),
        )
    spec = TableSpec(
        name="dn_hb",
        columns=(
            ColumnSpec("id", "long"),
            ColumnSpec("lastUpdated", "long"),
            ColumnSpec("load", "double"),
        ),
        primary_key=("id",),
        versioned=True,
    )
    dn = VersionedTable(spark, spec, os.path.join(root, "dn"))
    dn.init()
    stream = (
        spark.readStream.schema("id long, lastUpdated long, load double")
        .option("maxFilesPerTrigger", 1)
        .parquet(hb_dir)
    )
    sq = heartbeat_applier(stream, dn, os.path.join(root, "ckpt"))
    sq.awaitTermination()
    return dn.live().select("id", "lastUpdated", "load")


@q("stream_neardup_pairs", _JACCARD_SQL)
def stream_neardup_pairs(spark, sf_dir):
    """Streaming near-dup dedup as a driver row — the d5/d6
    convergence-oracle pattern applied to the ingest tier
    (:func:`~adfs_spark.streaming.loops.neardup_stream`): the
    documents table arrives in three ingest waves (file source, one
    wave per micro-batch under availableNow); each epoch dedups
    against the accumulated corpus index, emits the pairs it
    completes, then appends its own banded rows.  The UNION of
    per-epoch pair outputs must equal the exact all-pairs 3-gram
    Jaccard oracle over the FULL table — the same oracle as the batch
    ``dedup_minhash_lsh`` row — so the incremental index, epoch
    fencing, and exactly-once pair emission are value-checked end to
    end.  Wave files are written driver-side (bounded: this row runs
    at correctness scale, like the d6 heartbeat waves)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from adfs_spark.streaming.loops import neardup_stream

    root = _tmp_root("adfs_sstream_")
    src = os.path.join(root, "waves")
    os.makedirs(src)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for w in range(3):
        wave = d.filter(F.col("doc_id") % 3 == w).toPandas()
        pq_.write_table(
            pa.Table.from_pandas(wave, preserve_index=False),
            os.path.join(src, f"wave{w}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sq = neardup_stream(
        stream, spark, os.path.join(root, "state"), os.path.join(root, "ckpt"),
        num_hashes=64, num_bands=16, threshold=0.8,
    )
    sq.awaitTermination()
    pairs = spark.read.parquet(os.path.join(root, "state", "pairs"))
    return pairs.select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))


@q(
    "stream_ivm_groupagg",
    """WITH base AS (SELECT o_orderkey AS k, o_orderpriority AS g,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
                FROM orders WHERE o_orderkey % 20 = 0),
       fin AS (SELECT k,
                CASE WHEN k % 80 = 0 THEN 'MOVED' ELSE g END AS g,
                CASE WHEN k % 60 = 0 THEN v + 111.0 ELSE v END AS v
               FROM base WHERE k % 100 <> 0)
       SELECT g, round(sum(v), 2) AS sum_v, count(*) AS n_rows
       FROM fin GROUP BY g""",
)
def stream_ivm_groupagg(spark, sf_dir):
    """Stateful IVM as a driver row: a source VersionedTable mutates
    (value update, GROUP MOVE, tombstone delete), the streaming
    maintainer (:func:`~adfs_spark.streaming.loops.
    maintain_group_aggregate`) consumes its changelog micro-batches and
    incrementally recomputes only the affected groups; the converged
    aggregate table must equal the relational group-by over the final
    state.  The group-move case is the hard one — the maintainer must
    find the row's OLD group from changelog history, not just the
    batch's new image."""
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable
    from adfs_spark.streaming.loops import maintain_group_aggregate

    root = _tmp_root("adfs_ivm_")
    src_spec = TableSpec(
        name="ivm_src",
        columns=(
            ColumnSpec("k", "long"),
            ColumnSpec("g", "string"),
            ColumnSpec("v", "double"),
        ),
        primary_key=("k",),
        versioned=True,
    )
    base = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("g"),
        _dec("o_totalprice").cast("double").alias("v"),
    )
    src = VersionedTable(spark, src_spec, os.path.join(root, "src"))
    src.init(base)
    src.update_where(F.col("k") % 60 == 0, {"v": F.col("v") + 111.0})
    src.update_where(F.col("k") % 80 == 0, {"g": F.lit("MOVED")})
    src.delete_where(F.col("k") % 100 == 0)

    agg_spec = TableSpec(
        name="ivm_agg",
        columns=(
            ColumnSpec("g", "string"),
            ColumnSpec("sum_v", "double"),
            ColumnSpec("n_rows", "long"),
        ),
        primary_key=("g",),
        versioned=True,
    )
    agg = VersionedTable(spark, agg_spec, os.path.join(root, "agg"))
    agg.init()
    sq = maintain_group_aggregate(src, agg, "g", "v", os.path.join(root, "ckpt"))
    sq.awaitTermination()
    return agg.live().select("g", F.round("sum_v", 2).alias("sum_v"), "n_rows")


@q(
    "stream_interval_join",
    """SELECT l.event_id AS error_id, l.user_id, r.event_id AS click_id,
              CAST((epoch_us(r.ts) - epoch_us(l.ts)) // 1000 AS BIGINT) AS delta_ms
       FROM (SELECT * FROM events WHERE event_type = 'error') l
       JOIN (SELECT * FROM events WHERE event_type = 'click') r
         ON l.user_id = r.user_id
        AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 60 MINUTE""",
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream interval join as a driver row
    (:func:`~adfs_spark.streaming.loops.interval_join_streams`): error
    and click events arrive as two independent file streams in
    multiple micro-batches; the watermarked, time-bounded join pairs
    each error with the same user's clicks inside [ts, ts+60min].
    Inner-join emission is order-insensitive, so the accumulated sink
    must equal the relational interval join over the FULL events table
    — state-store retention, cross-batch matching, and the time bound
    are value-checked end to end.  Wave files are written driver-side
    (bounded: correctness scale, like the d6 heartbeat waves)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from adfs_spark.streaming.loops import interval_join_streams

    root = _tmp_root("adfs_sjoin_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").alias("ts_ns"), "event_type"
    )
    dirs = {}
    for side, etype in (("left", "error"), ("right", "click")):
        d = os.path.join(root, side)
        os.makedirs(d)
        dirs[side] = d
        rows = ev.filter(F.col("event_type") == etype).select(
            "event_id", "user_id", "ts_ns"
        )
        for w in range(2):
            wave = rows.filter(F.col("event_id") % 2 == w).toPandas()
            pq_.write_table(
                pa.Table.from_pandas(wave, preserve_index=False),
                os.path.join(d, f"wave{w}.parquet"),
            )

    def _stream(d):
        s = (
            spark.readStream.schema("event_id long, user_id long, ts_ns long")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        # fixture ts is ns-since-epoch at µs precision: DIV 1000 is exact
        return s.withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
        )

    joined = interval_join_streams(
        _stream(dirs["left"]), _stream(dirs["right"]),
        key_col="user_id", upper="60 minutes", watermark="2 hours",
    )
    out_dir = os.path.join(root, "out")
    sq = (
        joined.select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("event_id_r").alias("click_id"),
            F.expr("(ts_ns_r - ts_ns) DIV 1000000").alias("delta_ms"),
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.read.schema(
        "error_id long, user_id long, click_id long, delta_ms long"
    ).parquet(out_dir)


_LIVENESS_TIMEOUT_MS = 1_100_000_000  # ~12.7 days: brackets the fixture's
# median wave-max gap, so both ALIVE paths (first heartbeat, recovery
# after a gap > timeout) occur at every correctness SF


@q(
    "stream_liveness",
    f"""WITH e AS (SELECT user_id AS key, epoch_ms(ts) AS ms FROM events),
       b AS (SELECT min(ms) AS lo, max(ms) + 1 AS hi FROM e),
       w AS (SELECT key, ms,
                    least(2, CAST(floor(3.0 * (ms - lo) / (hi - lo)) AS INT)) AS wave
             FROM e, b),
       m AS (SELECT key, wave, max(ms) AS newest FROM w GROUP BY key, wave),
       g AS (SELECT key, wave, newest,
                    lag(newest) OVER (PARTITION BY key ORDER BY wave) AS prev
             FROM m)
       SELECT key, 'ALIVE' AS status, newest AS last_heartbeat_ms
       FROM g WHERE prev IS NULL OR newest - prev > {_LIVENESS_TIMEOUT_MS}""",
)
def stream_liveness(spark, sf_dir):
    """Heartbeat liveness state machine as a driver row
    (:func:`~adfs_spark.streaming.stateful.liveness_monitor`, the
    streaming twin of T2 heartbeatCheck :2392-2397): per-user
    heartbeats (event timestamps in ms) arrive in three time-ordered
    waves, one micro-batch each; the applyInPandasWithState machine
    emits ALIVE on a key's first heartbeat and again on recovery after
    an observed gap > timeout.  The oracle recomputes the transitions
    relationally — wave bucketing, per-wave max, lag over waves, the
    gap threshold — so cross-batch state carryover is value-checked.
    The DEAD/processing-time-timeout path is pytest-pinned
    (test_stateful_streaming); bounded replays disable it by contract
    (``emit_dead=False``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from adfs_spark.streaming.stateful import liveness_monitor

    root = _tmp_root("adfs_slive_")
    src = os.path.join(root, "waves")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), F.unix_millis(F.col("ts")).alias("hb_ms")
    )
    lo, hi = ev.agg(F.min("hb_ms"), F.max("hb_ms") + 1).first()
    waved = ev.withColumn(
        "wave",
        F.least(
            F.lit(2),
            F.floor(3.0 * (F.col("hb_ms") - F.lit(lo)) / F.lit(float(hi - lo))).cast("int"),
        ),
    )
    for w in range(3):
        pdf = waved.filter(F.col("wave") == w).select("key", "hb_ms").toPandas()
        p = os.path.join(src, f"wave{w}.parquet")
        pq_.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        # file-source batch order follows modification time: pin it
        os.utime(p, (1_700_000_000 + w, 1_700_000_000 + w))
    stream = (
        spark.readStream.schema("key long, hb_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = os.path.join(root, "out")
    sq = (
        liveness_monitor(stream, timeout_ms=_LIVENESS_TIMEOUT_MS, emit_dead=False)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.read.schema(
        "key long, status string, last_heartbeat_ms long"
    ).parquet(out_dir)


@q(
    "s11_ddl_source",
    """SELECT * FROM (VALUES
 ('file', 'CREATE TABLE IF NOT EXISTS nn_state.file (id bigint, parentId bigint, name string, length bigint, blockSize int, replication tinyint, atime bigint, mtime bigint, owner int, permission smallint, leaseHolder string, leaseRecoveryTime bigint, nsQuota bigint, dsQuota bigint, version bigint) USING parquet'),
 ('block', 'CREATE TABLE IF NOT EXISTS nn_state.block (id bigint, datanodeId bigint, length bigint, generationStamp bigint, fileId bigint, fileIndex int, version bigint) USING parquet'),
 ('datanode', 'CREATE TABLE IF NOT EXISTS nn_state.datanode (id bigint, name string, storageId string, ipcPort int, infoPort int, capacity bigint, dfsUsed bigint, remaining bigint, lastUpdated bigint, xceiverCount int, location string, adminState string, version bigint) USING parquet'),
 ('lease', 'CREATE TABLE IF NOT EXISTS nn_state.lease (holder string, time bigint, version bigint) USING parquet')
) AS t(tbl, ddl)""",
)
def s11_ddl_source(spark, sf_dir):
    """S11 as a driver row: the schema registry's emitted DDL for the
    four nn_state tables (parseTableDescription
    DistributedDataRepositoryBaseOnTable.java:684-763 → Spark-SQL
    dialect).  The oracle hardcodes the expected strings — a golden
    check, so a registry regression (column drop/rename/type change)
    fails the driver gate, not just pytest."""
    from adfs_spark.schema import BLOCK, DATANODE, FILE, LEASE

    rows = [(s.name, s.ddl()) for s in (FILE, BLOCK, DATANODE, LEASE)]
    return spark.createDataFrame(rows, "tbl string, ddl string")


@q(
    "d2_time_travel",
    f"""WITH base AS ({_KV_BASE_SQL})
        SELECT k, CASE WHEN k % 30 = 0 THEN v + 9.0 ELSE v END AS v
        FROM base""",
)
def d2_time_travel(spark, sf_dir):
    """D2 as time travel on the REAL write path: a VersionedTable is
    seeded and updated, the version watermark is recorded, then the
    table keeps moving (tombstone delete + new-key upsert) — and the
    as-of read must still reconstruct the intermediate state exactly
    from the change log (findRowByVersion :160-166 semantics; the
    _vbucket partitioning prunes history above the target so an old
    snapshot never scans the log tail).  The oracle is the pure
    relational intermediate state; later writes must be invisible."""
    from adfs_spark.storage import VersionedTable

    spec = _kv_spec()
    root = _tmp_root("adfs_tt_")
    t = VersionedTable(spark, spec, os.path.join(root, "t"))
    t.init(_kv_base(spark, sf_dir))
    t.update_where(F.col("k") % 30 == 0, {"v": F.col("v") + 9.0})
    v_mark = t.max_version()
    # the table moves on: deletes and new keys that must NOT appear
    t.delete_where(F.col("k") % 40 == 0)
    t.upsert(
        _kv_base(spark, sf_dir).select((F.col("k") + 1_000_000).alias("k"), "v")
    )
    return t.live_as_of(v_mark).select("k", "v")


@q(
    "d3_rollback_restore",
    f"""WITH base AS ({_KV_BASE_SQL})
        SELECT k, CASE WHEN k % 30 = 0 THEN v + 9.0 ELSE v END AS v
        FROM base""",
)
def d3_rollback_restore(spark, sf_dir):
    """D3 as point-in-time restore: after the watermark the table
    takes a delete AND an overwriting upsert AND brand-new keys;
    ``rollback_to`` must forward-write corrections (re-upsert the
    clobbered rows, tombstone the new keys) so the live view equals
    the as-of state — while history stays append-only (the rollback
    is itself rollback-able).  Oracle = the same relational
    intermediate state as d2_time_travel, but the engine path is the
    correction writer, not the as-of reader."""
    from adfs_spark.storage import VersionedTable

    spec = _kv_spec()
    root = _tmp_root("adfs_rb_")
    t = VersionedTable(spark, spec, os.path.join(root, "t"))
    t.init(_kv_base(spark, sf_dir))
    t.update_where(F.col("k") % 30 == 0, {"v": F.col("v") + 9.0})
    v_mark = t.max_version()
    t.delete_where(F.col("k") % 40 == 0)
    t.update_where(F.col("k") % 50 == 0, {"v": F.lit(-1.0)})
    t.upsert(
        _kv_base(spark, sf_dir).select((F.col("k") + 1_000_000).alias("k"), "v")
    )
    t.rollback_to(v_mark)
    return t.live().select("k", "v")


@q(
    "u6_append_overlay",
    f"""WITH base AS ({_KV_BASE_SQL}),
         final AS (
           SELECT k, CASE WHEN k % 60 = 0 THEN v + 111.0 ELSE v END AS v
           FROM base WHERE k % 100 <> 0
           UNION ALL
           SELECT k + 1000000, v FROM base WHERE k % 200 = 0)
        SELECT 'overlay' AS form, k, v FROM final
        UNION ALL
        SELECT 'folded', k, v FROM final""",
)
def u6_append_overlay(spark, sf_dir):
    """U6/SCALE §12 as a driver row: the changelog-APPEND write mode on
    the real write path.  A bucketed VersionedTable takes a masked
    update, a tombstone delete and a new-key upsert all in ``append``
    mode — no bucket is rewritten; the ops live only in the changelog
    and reads LWW-merge the pending overlay (the engine's analog of the
    reference's B-tree point updates, FileRepository.updateInternal
    :226-286 / deleteInternal :288-305).  The live view is captured
    BOTH ways — through the overlay, then again after ``compact()``
    folds it into current/ — and both must equal the same relational
    final state, proving the overlay read path is semantically
    invisible."""
    from adfs_spark.storage import VersionedTable

    spec = _kv_spec()
    root = _tmp_root("adfs_ovl_")
    t = VersionedTable(spark, spec, os.path.join(root, "t"), num_buckets=16)
    t.init(_kv_base(spark, sf_dir))
    t.update_where(F.col("k") % 60 == 0, {"v": F.col("v") + 111.0}, mode="append")
    t.delete_where(F.col("k") % 100 == 0, mode="append")
    t.upsert(
        _kv_base(spark, sf_dir)
        .filter(F.col("k") % 200 == 0)
        .select((F.col("k") + 1_000_000).alias("k"), "v"),
        mode="append",
    )
    # materialize the overlay view BEFORE compacting (lazy plans would
    # otherwise re-read the rewritten files)
    overlay = (
        t.live().select(F.lit("overlay").alias("form"), "k", "v")
        .localCheckpoint(eager=True)
    )
    t.compact()
    folded = t.live().select(F.lit("folded").alias("form"), "k", "v")
    return overlay.unionByName(folded)


@q(
    "sq_having_big_orders",
    """WITH big AS (
         SELECT l_orderkey,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_orderkey
         HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
       SELECT o.o_orderkey, o.o_custkey, c.c_name,
              CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
              big.sum_qty
       FROM big JOIN orders o ON o.o_orderkey = big.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey""",
)
def sq_having_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN (SELECT ... GROUP BY ... HAVING SUM > t)
    decorrelated as aggregate → HAVING filter → fact join back →
    dim join.  The HAVING side aggregates lineitem once on its join
    key, so the subsequent orders join needs no re-shuffle of the
    aggregate (same hash key); customer is dim-sized and AQE
    broadcasts it at any SF where it fits."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    lf = _fits_longsum(sf_dir)
    if lf:
        # HAVING on the raw scaled sum: _sq100 = 100× the exact decimal
        # sum, so `> 25000` is the same cut as `> 250` on the decimal.
        # Above the gate ("wide") the terms accumulate in decimal —
        # same value, unbounded headroom (see _lsum_wide).
        raw = _lraw("l_quantity")
        if lf == "wide":
            raw = raw.cast("decimal(20,0)")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum(raw).alias("_sq100"))
            .filter(F.col("_sq100") > 25000)
            .select("l_orderkey", _lfin("_sq100", "sum_qty"))
        )
    else:
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum(_dec("l_quantity")).alias("_sq"))
            .filter(F.col("_sq") > 250)
            .select("l_orderkey", F.col("_sq").cast("double").alias("sum_qty"))
        )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "o_orderkey",
            "o_custkey",
            "c_name",
            _dec("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


_PR_DAMP = 0.85
# 3 unrolled power iterations in SQL: nodes = src ∪ dst of the distinct
# edge set, dangling (no-out-edge) mass redistributed uniformly each
# round — exactly functions/graph.pagerank's semantics.
_PR_SQL = f"""
WITH e AS (SELECT DISTINCT src, dst FROM (
         SELECT n_nationkey AS src, (7 * n_nationkey + 3) % 25 AS dst
         FROM nation WHERE n_nationkey % 5 <> 0
         UNION ALL
         SELECT n_nationkey, (3 * n_nationkey + 11) % 25
         FROM nation WHERE n_nationkey % 5 <> 0 AND n_nationkey % 2 = 0)),
     nodes AS (SELECT DISTINCT node FROM
         (SELECT src AS node FROM e UNION SELECT dst FROM e)),
     nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
     deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
     r0 AS (SELECT node, 1.0 AS rank FROM nodes),
     d0 AS (SELECT coalesce(sum(rank), 0) AS m FROM r0
            LEFT JOIN deg ON r0.node = deg.src WHERE deg.src IS NULL),
     c0 AS (SELECT e.dst AS node, sum(r0.rank / deg.d) AS cin
            FROM r0 JOIN deg ON r0.node = deg.src
            JOIN e ON e.src = r0.node GROUP BY e.dst),
     r1 AS (SELECT nodes.node,
                   (1 - {_PR_DAMP}) + {_PR_DAMP} * (SELECT m FROM d0) / (SELECT n FROM nn)
                   + {_PR_DAMP} * coalesce(c0.cin, 0) AS rank
            FROM nodes LEFT JOIN c0 ON nodes.node = c0.node),
     d1 AS (SELECT coalesce(sum(rank), 0) AS m FROM r1
            LEFT JOIN deg ON r1.node = deg.src WHERE deg.src IS NULL),
     c1 AS (SELECT e.dst AS node, sum(r1.rank / deg.d) AS cin
            FROM r1 JOIN deg ON r1.node = deg.src
            JOIN e ON e.src = r1.node GROUP BY e.dst),
     r2 AS (SELECT nodes.node,
                   (1 - {_PR_DAMP}) + {_PR_DAMP} * (SELECT m FROM d1) / (SELECT n FROM nn)
                   + {_PR_DAMP} * coalesce(c1.cin, 0) AS rank
            FROM nodes LEFT JOIN c1 ON nodes.node = c1.node),
     d2 AS (SELECT coalesce(sum(rank), 0) AS m FROM r2
            LEFT JOIN deg ON r2.node = deg.src WHERE deg.src IS NULL),
     c2 AS (SELECT e.dst AS node, sum(r2.rank / deg.d) AS cin
            FROM r2 JOIN deg ON r2.node = deg.src
            JOIN e ON e.src = r2.node GROUP BY e.dst),
     r3 AS (SELECT nodes.node,
                   (1 - {_PR_DAMP}) + {_PR_DAMP} * (SELECT m FROM d2) / (SELECT n FROM nn)
                   + {_PR_DAMP} * coalesce(c2.cin, 0) AS rank
            FROM nodes LEFT JOIN c2 ON nodes.node = c2.node)
SELECT node, round(rank, 5) AS rank FROM r3
"""


@q("graph_pagerank", _PR_SQL)
def graph_pagerank(spark, sf_dir):
    """PageRank driver row: 3 power iterations over a deterministic
    25-node nation link graph (with genuine dangling nodes — every
    n%5==0 nation has no out-edges), value-checked against the same
    iterations unrolled as SQL CTEs.  Exercises the full iterative
    join+groupBy loop including the distributed dangling-mass scalar."""
    from adfs_spark.functions.graph import pagerank

    n = load_table(spark, sf_dir, "nation")
    src_ok = n.filter(F.col("n_nationkey") % 5 != 0)
    e1 = src_ok.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((7 * F.col("n_nationkey") + 3) % 25).cast("long").alias("dst"),
    )
    e2 = src_ok.filter(F.col("n_nationkey") % 2 == 0).select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((3 * F.col("n_nationkey") + 11) % 25).cast("long").alias("dst"),
    )
    ranks = pagerank(e1.unionByName(e2), iters=3)
    return ranks.select("node", F.round("rank", 5).alias("rank"))


@q("sim_ivfpq_topk", _COS_SQL)
def sim_ivfpq_topk(spark, sf_dir):
    """IVF-PQ, full path (the 100 TB ANN tier): distributed k-means
    centroids, per-subspace PQ codebooks, codes-only ADC scan, exact
    cosine re-rank.  Probing all cells with an uncapped shortlist makes
    the re-ranked result exactly the brute-force top-k, so the entire
    train→encode→ADC→re-rank pipeline is value-checked against the
    exact cosine oracle; recall at n_probe/shortlist below exact is
    covered by the planted-cluster pytest."""
    from adfs_spark.functions.similarity import (
        ivf_assign,
        ivf_pq_topk,
        kmeans_train,
        pq_encode,
        pq_train,
    )

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cents = kmeans_train(e, k=4, iters=2)
    books = pq_train(e, m=4, k=8, iters=2)
    enc = pq_encode(ivf_assign(e, cents), books)
    got = ivf_pq_topk(
        enc, cents, books, qv, k=10, n_probe=4, rerank_with=e, shortlist=1 << 30
    )
    return got.select("vec_id", F.round("sim", 5).alias("sim"))


# =========================================================================
# Driver-facing export: the harness verifies the FIRST 50 queries()
# entries, so the full declared surface is consolidated into exactly 50
# — single queries where the operator stands alone, tagged-union
# "suites" where a family shares a fixture shape.  Every suite member
# keeps its own standalone QUERIES entry (bench/pytest target them);
# the suite unions members onto the superset of their output columns
# (case_tag + typed columns, NULL where a member lacks one) with the
# oracle built the same way, so the driver's row-count/schema/value-
# hash check covers every member's full output.
# =========================================================================

_DUCK_T = {"long": "BIGINT", "double": "DOUBLE", "string": "VARCHAR"}


def _tagged_union_fn(members: list[tuple[str, list[str]]], cols: list[tuple[str, str]]):
    def fn(spark, sf_dir) -> DataFrame:
        out: DataFrame | None = None
        for mname, mcols in members:
            df = QUERIES[mname][0](spark, sf_dir)
            have = set(mcols)
            sel = [F.lit(mname).alias("case_tag")]
            for cname, ctype in cols:
                src = F.col(cname) if cname in have else F.lit(None)
                sel.append(src.cast(ctype).alias(cname))
            part = df.select(*sel)
            out = part if out is None else out.unionByName(part)
        assert out is not None
        return out

    return fn


def _tagged_union_sql(members: list[tuple[str, list[str]]], cols: list[tuple[str, str]]) -> str:
    parts = []
    for mname, mcols in members:
        sql = QUERIES[mname][1]
        assert sql is not None, f"suite member {mname} lacks an oracle"
        have = set(mcols)
        proj = [f"'{mname}' AS case_tag"]
        for cname, ctype in cols:
            dt = _DUCK_T[ctype]
            if cname in have:
                proj.append(f'CAST("{cname}" AS {dt}) AS "{cname}"')
            else:
                proj.append(f'CAST(NULL AS {dt}) AS "{cname}"')
        parts.append(f"SELECT {', '.join(proj)} FROM ({sql})")
    return "\nUNION ALL\n".join(parts)


SUITE_MEMBERS: dict[str, list[str]] = {}


def _suite(name: str, members: list[tuple[str, list[str]]], cols: list[tuple[str, str]]):
    SUITE_MEMBERS[name] = [m for m, _ in members]
    QUERIES[name] = (
        _tagged_union_fn(members, cols),
        _tagged_union_sql(members, cols),
    )


_L, _D, _S = "long", "double", "string"

_suite(
    "s1_find_suite",
    [
        ("s1_point_lookup", ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate_s", "o_orderpriority"]),
        ("s1_range_limit_offset", ["o_orderkey", "o_totalprice"]),
        ("s1_composite_prefix", ["l_orderkey", "l_linenumber", "l_quantity"]),
        ("s1_composite_point", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]),
        ("p4_in_filter", ["o_orderkey", "o_orderstatus"]),
        ("p3_null_probe", ["o_orderkey", "o_totalprice"]),
        ("s6_pagination_keyset", ["n_nationkey", "n_name"]),
        ("p5_tombstone_filter", ["o_orderkey", "version"]),
        ("s3_point_lookup_bucketed", ["k", "v"]),
    ],
    [
        ("o_orderkey", _L), ("o_custkey", _L), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate_s", _S), ("o_orderpriority", _S),
        ("l_orderkey", _L), ("l_linenumber", _L), ("l_quantity", _D),
        ("l_extendedprice", _D), ("n_nationkey", _L), ("n_name", _S),
        ("version", _L), ("k", _L), ("v", _D),
    ],
)

_suite(
    "scalar_metrics_suite",
    [
        ("s9_count", ["cnt"]),
        ("a5_global_stats", ["sum_qty", "n_rows", "n_parts", "avg_price"]),
        ("a7_max_version", ["max_version"]),
        ("p7_validity_probe", ["found_500", "found_missing"]),
        ("a8_observe_counters", ["n_rows", "n_live", "n_tombstone"]),
    ],
    [
        ("cnt", _L), ("sum_qty", _D), ("n_rows", _L), ("n_parts", _L),
        ("avg_price", _D), ("max_version", _L),
        ("found_500", _L), ("found_missing", _L),
        ("n_live", _L), ("n_tombstone", _L),
    ],
)

_suite(
    "j5_report_reconcile",
    [
        ("j5_anti_reported", ["event_id"]),
        ("j5_anti_stored", ["o_orderkey"]),
        ("j5_corrupt_classify", ["id", "class"]),
        ("j_skew_split", ["o_orderkey", "o_custkey", "c_name"]),
        ("j_skew_replicated", ["o_orderkey", "o_custkey", "c_name"]),
    ],
    [
        ("event_id", _L), ("o_orderkey", _L), ("id", _L), ("class", _S),
        ("o_custkey", _L), ("c_name", _S),
    ],
)

_suite(
    "argmax_suite",
    [
        ("a2_group_argmax", ["l_orderkey", "l_linenumber", "last_shipdate"]),
        ("w1_argmax_window", ["l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"]),
    ],
    [
        ("l_orderkey", _L), ("l_linenumber", _L), ("last_shipdate", _S),
        ("l_suppkey", _L), ("l_extendedprice", _D),
    ],
)

_suite(
    "a4_summary_suite",
    [
        ("a4_status_summary", ["o_orderstatus", "n_orders", "sum_price", "n_urgent"]),
        ("a4_content_summary_tree", ["total_length", "file_count", "dir_count"]),
        ("a4_quota_usage", ["id", "nsQuota", "nsUsed", "exceeded"]),
    ],
    [
        ("o_orderstatus", _S), ("n_orders", _L), ("sum_price", _D),
        ("n_urgent", _L), ("total_length", _L), ("file_count", _L),
        ("dir_count", _L), ("id", _L), ("nsQuota", _L), ("nsUsed", _L),
        ("exceeded", _L),
    ],
)

_suite(
    "w_rank_suite",
    [
        ("w3_priority_topk", ["o_orderkey", "priority"]),
        ("w4_pick_one_per_group", ["c_nationkey", "c_custkey", "c_name"]),
        ("sort_topk_global", ["o_orderkey", "o_totalprice"]),
        ("w_rank_dense_ties", ["o_custkey", "o_orderkey", "rnk", "drnk"]),
        ("w_topk_salted", ["l_orderkey", "l_linenumber", "rank"]),
    ],
    [
        ("o_orderkey", _L), ("priority", _L), ("c_nationkey", _L),
        ("c_custkey", _L), ("c_name", _S), ("o_totalprice", _D),
        ("o_custkey", _L), ("rnk", _L), ("drnk", _L),
        ("l_orderkey", _L), ("l_linenumber", _L), ("rank", _L),
    ],
)

_suite(
    "w_analytic_suite",
    [
        ("window_running_total", ["o_custkey", "o_orderkey", "running_spend"]),
        ("window_event_gaps", ["event_id", "user_id", "gap_s"]),
        ("window_spend_quartiles", ["o_custkey", "total_spend", "quartile", "pct_rank"]),
    ],
    [
        ("o_custkey", _L), ("o_orderkey", _L), ("running_spend", _D),
        ("event_id", _L), ("user_id", _L), ("gap_s", _L),
        ("total_spend", _D), ("quartile", _L), ("pct_rank", _D),
    ],
)

_suite(
    "t_threshold_suite",
    [
        ("t1_expired_threshold", ["event_id"]),
        ("t2_stale_relative", ["event_id"]),
    ],
    [("event_id", _L)],
)

_suite(
    "h_path_suite",
    [
        ("h1_chain_resolution", ["c_custkey", "path"]),
        ("h2_path_column", ["id", "path"]),
    ],
    [("c_custkey", _L), ("id", _L), ("path", _S)],
)

_suite(
    "h_tree_suite",
    [
        ("h3_listing_children", ["c_custkey", "c_name"]),
        ("h4_descendants", ["id", "name", "level"]),
        ("h_du_rollup", ["id", "n_files", "total_size"]),
    ],
    [
        ("c_custkey", _L), ("c_name", _S), ("id", _L), ("name", _S),
        ("level", _L), ("n_files", _L), ("total_size", _D),
    ],
)

_suite(
    "d_changelog_suite",
    [
        ("d1_changelog_classify", ["o_orderkey", "version", "op"]),
        ("d2_delta_range", ["o_orderkey", "version"]),
        ("s11_ddl_source", ["tbl", "ddl"]),
        ("d2_time_travel", ["k", "v"]),
        ("d3_rollback_restore", ["k", "v"]),
        ("u_sync_roundtrip", ["mode", "k", "v"]),
        ("d5_editlog_converged", ["k", "v"]),
        ("d6_heartbeat_converged", ["id", "lastUpdated", "load"]),
        ("stream_neardup_pairs", ["id_a", "id_b", "jaccard"]),
        ("stream_ivm_groupagg", ["g", "sum_v", "n_rows"]),
        ("stream_interval_join", ["error_id", "user_id", "click_id", "delta_ms"]),
        ("stream_liveness", ["key", "status", "last_heartbeat_ms"]),
        ("d8_election_trace", ["epoch", "leader", "leader_version"]),
    ],
    [
        ("o_orderkey", _L), ("version", _L), ("op", _S),
        ("tbl", _S), ("ddl", _S),
        ("mode", _S), ("k", _L), ("v", _D),
        ("id", _L), ("lastUpdated", _L), ("load", _D),
        ("id_a", _L), ("id_b", _L), ("jaccard", _D),
        ("g", _S), ("sum_v", _D), ("n_rows", _L),
        ("error_id", _L), ("user_id", _L), ("click_id", _L), ("delta_ms", _L),
        ("key", _L), ("status", _S), ("last_heartbeat_ms", _L),
        ("epoch", _L), ("leader", _S), ("leader_version", _L),
    ],
)

_suite(
    "u_write_suite",
    [
        ("u1_upsert_overwrite", ["o_orderkey", "price", "src"]),
        ("u2_masked_update", ["o_orderkey", "o_orderpriority", "updated"]),
        ("u3_tombstone_preview", ["o_orderkey", "new_version"]),
        ("u5_id_alloc", ["o_orderkey", "new_id"]),
        ("u6_append_overlay", ["form", "k", "v"]),
    ],
    [
        ("o_orderkey", _L), ("price", _D), ("src", _S),
        ("o_orderpriority", _S), ("updated", _L), ("new_version", _L),
        ("new_id", _L), ("form", _S), ("k", _L), ("v", _D),
    ],
)

_suite(
    "f_scalar_suite",
    [
        ("f1_path_roundtrip", ["c_custkey", "depth", "root"]),
        ("f2_ip_pack_roundtrip", ["event_id", "user_id", "packed", "ip_back", "port_back"]),
        ("f4_flags", ["id", "is_dir", "under_construction"]),
        ("f5_name_guard", ["n_nationkey", "valid"]),
        ("f6_update_flags", ["o_orderkey", "inc", "dec"]),
        ("f7_block_locations", ["block_id", "file_id", "file_index", "datanode_id", "datanode_name"]),
    ],
    [
        ("c_custkey", _L), ("depth", _L), ("root", _S), ("event_id", _L),
        ("user_id", _L), ("packed", _L), ("ip_back", _L), ("port_back", _L),
        ("id", _L), ("is_dir", _L), ("under_construction", _L),
        ("n_nationkey", _L), ("valid", _L), ("o_orderkey", _L),
        ("inc", _D), ("dec", _D),
        ("block_id", _L), ("file_id", _L), ("file_index", _L),
        ("datanode_id", _L), ("datanode_name", _S),
    ],
)

_suite(
    "sim_ivf_suite",
    [
        ("sim_ivf_topk", ["vec_id", "sim"]),
        ("sim_ivfpq_topk", ["vec_id", "sim"]),
        ("sim_topk_quantized", ["vec_id", "sim"]),
    ],
    [("vec_id", _L), ("sim", _D)],
)

_suite(
    "events_window_suite",
    [
        ("events_hourly_window", ["hour", "event_type", "n", "sum_value"]),
        ("events_sliding_window", ["win_start", "n"]),
        ("events_latest_per_user", ["user_id", "event_id", "ts_s"]),
        ("events_json_extract", ["event_type", "sum_k", "n_with_k"]),
        ("events_session_window", ["user_id", "session_start_s", "session_end_s", "n_events", "sum_value"]),
        ("events_funnel", ["step", "step_index", "n_users"]),
        ("events_retention", ["cohort_week", "week_offset", "n_active"]),
        ("events_hourly_unique_users", ["hour", "n_users"]),
    ],
    [
        ("hour", _S), ("event_type", _S), ("n", _L), ("sum_value", _D),
        ("win_start", _S), ("user_id", _L), ("event_id", _L), ("ts_s", _S),
        ("sum_k", _L), ("n_with_k", _L),
        ("session_start_s", _S), ("session_end_s", _S), ("n_events", _L),
        ("step", _S), ("step_index", _L), ("n_users", _L),
        ("cohort_week", _S), ("week_offset", _L), ("n_active", _L),
    ],
)

_suite(
    "asof_range_suite",
    [
        ("asof_click_after_error", ["event_id", "user_id", "click_ts", "error_event_id", "error_ts"]),
        ("range_errors_before_click", ["event_id", "n_errors"]),
    ],
    [
        ("event_id", _L), ("user_id", _L), ("click_ts", _S),
        ("error_event_id", _L), ("error_ts", _S), ("n_errors", _L),
    ],
)

_suite(
    "pipeline_suite",
    [
        ("pipeline_split_counts", ["source", "split", "n"]),
        ("pipeline_stratified_cap", ["doc_id", "source"]),
        ("pipeline_weighted_mix", ["source", "n_kept"]),
        ("pipeline_pack_batches", ["source", "bin", "n_docs", "sum_tokens"]),
        ("pipeline_clean_corpus", ["source", "n_kept"]),
        ("pipeline_chunk_docs", ["doc_id", "chunk_index", "chunk_text", "n_tokens"]),
        ("dedup_components", ["node", "component"]),
        ("pipeline_scrub_pii", ["doc_id", "scrubbed", "n_masked"]),
        ("pipeline_decontaminate", ["doc_id", "n_hits"]),
        ("pipeline_lm_score", ["doc_id", "n_tokens", "avg_logprob"]),
        ("pipeline_url_filter", ["domain", "n_docs"]),
        ("pipeline_quality_rules", ["source", "rule", "n_failed", "n_passed"]),
        ("pipeline_shuffle_order", ["doc_id", "train_order"]),
        ("graph_pagerank", ["node", "rank"]),
        ("dedup_repeated_spans", ["span_fp", "n_docs", "n_occurrences", "keeper"]),
        ("dedup_minhash_incremental", ["id_a", "id_b", "jaccard"]),
        ("dedup_semantic", ["id_a", "id_b", "sim"]),
        ("pipeline_dsir_weights", ["doc_id", "logweight"]),
        ("pipeline_bm25_rank", ["doc_id", "bm25"]),
        ("s_warc_roundtrip", ["target_uri", "n_chars"]),
        ("dedup_canonical_survivors", ["component", "survivor_id", "n_members", "n_dropped"]),
        ("dedup_canonical_survivors_spanning", ["component", "survivor_id", "n_members", "n_dropped"]),
        ("pipeline_ccnet_buckets", ["doc_id", "lang", "bucket", "lp"]),
        ("corpus_report", ["source", "n_docs", "total_tokens", "n_dup_docs", "n_langs"]),
        ("s_jsonl_roundtrip", ["doc_id", "lang", "n_chars"]),
    ],
    [
        ("source", _S), ("split", _S), ("n", _L), ("doc_id", _L),
        ("n_kept", _L), ("bin", _L), ("n_docs", _L), ("sum_tokens", _L),
        ("chunk_index", _L), ("chunk_text", _S), ("n_tokens", _L),
        ("node", _L), ("component", _L), ("scrubbed", _S), ("n_masked", _L),
        ("n_hits", _L), ("avg_logprob", _D), ("domain", _S),
        ("rule", _S), ("n_failed", _L), ("n_passed", _L),
        ("train_order", _L), ("rank", _D), ("logweight", _D), ("bm25", _D),
        ("target_uri", _S), ("n_chars", _L),
        ("span_fp", _S), ("n_occurrences", _L), ("keeper", _L),
        ("id_a", _L), ("id_b", _L), ("jaccard", _D), ("sim", _D),
        ("survivor_id", _L), ("n_members", _L), ("n_dropped", _L),
        ("lang", _S), ("bucket", _S), ("lp", _D),
        ("total_tokens", _L), ("n_dup_docs", _L), ("n_langs", _L),
    ],
)

_suite(
    "agg_suite",
    [
        ("agg_pivot_priority", ["o_orderstatus", "urgent", "high", "medium"]),
        ("agg_rollup_status_priority", ["o_orderstatus", "o_orderpriority", "n_orders", "sum_price"]),
        ("agg_cube_flag_status", ["l_returnflag", "l_linestatus", "n", "sum_qty"]),
        ("agg_count_distinct", ["o_orderpriority", "n_customers", "n_orders"]),
        ("agg_quantile_rows", ["o_orderstatus", "q", "quantile_value"]),
        ("agg_hll_check", ["o_orderpriority", "n_exact", "within_tol"]),
        ("dq_profile_orders", ["col_name", "n_nonnull", "n_null", "n_distinct", "min_num", "max_num", "min_str", "max_str"]),
        ("dq_heavy_hitters", ["item", "n"]),
        ("q10_returned_items", ["c_custkey", "c_name", "revenue"]),
        ("agg_grouping_sets", ["gs_status", "gs_priority", "n_orders"]),
        ("agg_stats_battery", ["o_orderstatus", "median_price", "priorities", "corr_qty_price"]),
        ("agg_unpivot_metrics", ["l_returnflag", "metric", "total"]),
    ],
    [
        ("o_orderstatus", _S), ("urgent", _L), ("high", _L), ("medium", _L),
        ("o_orderpriority", _S), ("n_orders", _L), ("sum_price", _D),
        ("l_returnflag", _S), ("l_linestatus", _S), ("n", _L), ("sum_qty", _D),
        ("n_customers", _L), ("q", _L), ("quantile_value", _D),
        ("n_exact", _L), ("within_tol", _L),
        ("col_name", _S), ("n_nonnull", _L), ("n_null", _L), ("n_distinct", _L),
        ("min_num", _D), ("max_num", _D), ("min_str", _S), ("max_str", _S),
        ("item", _S), ("c_custkey", _L), ("c_name", _S), ("revenue", _D),
        ("gs_status", _S), ("gs_priority", _S),
        ("median_price", _D), ("priorities", _S), ("corr_qty_price", _D),
        ("metric", _S), ("total", _D),
    ],
)

_suite(
    "sq_set_suite",
    [
        ("sq_exists_late_ship", ["o_orderpriority", "n_orders"]),
        ("sq_not_exists_inactive", ["c_nationkey", "n_customers", "sum_acctbal"]),
        ("sq_scalar_small_quantity", ["sum_price", "n"]),
        ("sq_having_big_orders", ["o_orderkey", "o_custkey", "c_name", "o_totalprice", "sum_qty"]),
        ("sq_sole_late_shipper", ["s_suppkey", "s_name", "numwait"]),
        ("set_ops_customers", ["tag", "o_custkey"]),
        ("dq_pk_dupes", ["o_orderkey", "n_dup"]),
        ("dq_fk_orphans", ["l_orderkey", "n_rows"]),
    ],
    [
        ("o_orderpriority", _S), ("n_orders", _L), ("c_nationkey", _L),
        ("n_customers", _L), ("sum_acctbal", _D), ("sum_price", _D),
        ("n", _L), ("tag", _S), ("o_custkey", _L),
        ("o_orderkey", _L), ("n_dup", _L),
        ("l_orderkey", _L), ("n_rows", _L),
        ("c_name", _S), ("o_totalprice", _D), ("sum_qty", _D),
        ("s_suppkey", _L), ("s_name", _S), ("numwait", _L),
    ],
)

_suite(
    "mm_suite",
    [
        ("mm_feature_extract", ["media_id", "payload_size", "content_hash"]),
        ("mm_media_neardup", ["id_a", "id_b", "modality", "hamming"]),
    ],
    [
        ("media_id", _L), ("payload_size", _L), ("content_hash", _S),
        ("id_a", _L), ("id_b", _L), ("modality", _S), ("hamming", _L),
    ],
)

# The driver verifies the first 50 entries — this list IS the contract.
# Ordering: suites and single queries covering SURVEY §2 first, then
# the LLM-pipeline families, TPC-H headliners, and (last) the two
# genuinely-approximate LSH queries that run as rows-only checks.
EXPORTED: list[str] = [
    "s1_find_suite",
    "scalar_metrics_suite",
    "j1_fact_join",
    "j2_dim_broadcast",
    "j3_semi_join",
    "j5_report_reconcile",
    "j6_secondary_index_join",
    "argmax_suite",
    "a3_sum_per_parent",
    "a4_summary_suite",
    "a6_having_under_threshold",
    "w2_topk_per_group",
    "w_rank_suite",
    "w_analytic_suite",
    "t_threshold_suite",
    "h_path_suite",
    "h_tree_suite",
    "h5_recursive_delete",
    "h6_mkdirs_batch",
    "d_changelog_suite",
    "d7_table_diff",
    "u_write_suite",
    "u4_lww_merge",
    "u_lease_recovery_append",
    "f_scalar_suite",
    "text_doc_features",
    "text_lang_distribution",
    "text_tfidf_top_terms",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_knn_join",
    "sim_ivf_suite",
    "sim_embedding_neardup_exact",
    "mm_suite",
    "events_window_suite",
    "events_sessionize",
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_nation_revenue",
    "q6_filtered_revenue",
    "q14_promo_revenue",
    "asof_range_suite",
    "pipeline_suite",
    "agg_suite",
    "sq_set_suite",
    "sim_topk_lsh",
    "sim_embedding_neardup_lsh",
]
assert len(EXPORTED) == 50, f"driver cap is 50, got {len(EXPORTED)}"
assert all(n in QUERIES for n in EXPORTED)

# Closure declarations (enforced by tests/test_driver_contract.py):
# every registered query must be driver-reachable — EXPORTED itself, a
# member of an EXPORTED suite, folded into a reachable query's columns,
# or an engine-specific sketch whose oracle-checked twin is named here.
# A new query that is none of these fails CI until it is wired in.

FOLDED_INTO: dict[str, str] = {
    # per-doc text battery: each standalone query's output is a column
    # of the oracle-checked text_doc_features row
    "text_token_count": "text_doc_features",
    "text_quality_ratios": "text_doc_features",
    "text_langid_heuristic": "text_doc_features",
    "text_fingerprint_md5": "text_doc_features",
    # exact-quantile twin of the agg_suite member
    "agg_exact_quantiles": "agg_quantile_rows",
    # payload size is the `size` column of mm_feature_extract
    "mm_payload_size": "mm_feature_extract",
}

SKETCH_ONLY: dict[str, str] = {
    # engine-specific estimates (value depends on the sketch impl);
    # each names its oracle-checked exact/tolerance twin
    "agg_approx_quantiles": "agg_quantile_rows",
    "agg_hll_distinct": "agg_hll_check",
    "text_rolling_fingerprint": "text_doc_features",
}


def queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name][0] for name in EXPORTED}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name][1] for name in EXPORTED if QUERIES[name][1] is not None
    }
