"""Data-audit operators: column profiling and referential integrity.

The reference trusts its schema invariants to InnoDB (UNIQUE indexes on
pk/version — DistributedDataRepositoryBaseOnTable.java:544-545,
File.java:36-41) and its foreign keys to application discipline
(block.fileId → file.id, block.datanodeId → datanode.id are never
DB-enforced).  On a data lake there is no storage engine to enforce
either, so an analytics engine needs them as *queries*: duplicate-key
audits and orphan-foreign-key audits are the batch form of the
reference's UNIQUE index + the J5 report reconciliation's "stored but
unknown" class.  Column profiling is the same idea for value ranges —
what InnoDB gets from index statistics, a lake gets from one aggregate
pass.

Scale shapes:
- ``profile_columns`` is ONE global aggregation (map-side partial
  combine, a single reduce) plus a driver-free unpivot of the 1-row
  result.  The exact per-column COUNT(DISTINCT) terms make Catalyst
  expand the plan per distinct column — fine for routine audits; for
  very wide tables at 100 TB switch ``approx_distinct=True`` (HLL,
  one non-expanded pass).
- ``pk_duplicates`` is one groupBy on the key (the shuffle every
  exact-dedup pays); ``fk_orphans`` is one anti-join, broadcast when
  the parent side is a dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _is_numeric(dtype: str) -> bool:
    # decimal renders as 'decimal(p,s)' so membership alone misses it
    return dtype in _NUMERIC or dtype.startswith("decimal")


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx_distinct: bool = False
) -> DataFrame:
    """One row per column: non-null / null / distinct counts plus
    min/max (numeric columns surface them as doubles in
    ``min_num``/``max_num``; string columns in ``min_str``/``max_str``).

    Single aggregation pass; the one output row is exploded into
    per-column rows JVM-side (no collect).
    """
    dtypes = dict(df.dtypes)
    aggs: list = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c) if approx_distinct else F.countDistinct(c)
        )
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            nd.alias(f"{c}__dist"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)

    def _minmax(c: str, which: str):
        base = F.col(f"{c}__{which}")
        if _is_numeric(dtypes[c]):
            return base.cast("double"), F.lit(None).cast("string")
        return F.lit(None).cast("double"), base.cast("string")

    structs = []
    for c in cols:
        min_num, min_str = _minmax(c, "min")
        max_num, max_str = _minmax(c, "max")
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nn").alias("n_nonnull"),
                (F.col("__total") - F.col(f"{c}__nn")).alias("n_null"),
                F.col(f"{c}__dist").alias("n_distinct"),
                min_num.alias("min_num"),
                max_num.alias("max_num"),
                min_str.alias("min_str"),
                max_str.alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def pk_duplicates(df: DataFrame, pk: Sequence[str]) -> DataFrame:
    """Key groups violating a UNIQUE constraint: ``pk`` columns plus
    ``n_dup`` (the group size, always >= 2).  The batch form of the
    reference's UNIQUE index rejection (insertInternal's found-old-row
    check, DistributedDataRepositoryBaseOnTable.java:281-296)."""
    return (
        df.groupBy(*pk)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    fk: Sequence[str],
    pk: Sequence[str] | None = None,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Distinct child keys with no matching parent row, with the
    orphaned row count: (fk columns, ``n_rows``).  One anti-join —
    broadcast the parent when it is dimension-sized."""
    pk = list(pk or fk)
    keys = parent.select(*[F.col(p).alias(f) for p, f in zip(pk, fk)]).dropDuplicates()
    if broadcast_parent:
        keys = F.broadcast(keys)
    return (
        child.join(keys, on=list(fk), how="left_anti")
        .groupBy(*fk)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, sketch: bool = False
) -> DataFrame:
    """Top-``k`` most frequent values of ``col`` as (item, n) — skew
    diagnosis (which join keys will hot-spot), blocklist candidates,
    vocabulary heads.

    Exact tier: one groupBy + TakeOrderedAndProject (deterministic
    tie-break: count desc, then value) — the shuffle carries one row
    per distinct value.  Sketch tier: the ``approx_top_k`` aggregate, a
    single-pass map-side-mergeable sketch whose shuffle carries one
    sketch per partition regardless of cardinality — the right tier
    when the distinct count itself is huge."""
    if sketch:
        exploded = df.agg(
            F.expr(f"approx_top_k({col}, {k})").alias("_tk")
        ).select(F.explode("_tk").alias("_e"))
        return exploded.select(
            F.col("_e.item").cast("string").alias("item"),
            F.col("_e.count").alias("n"),
        )
    return (
        df.groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("item"))
        .limit(k)
    )
