"""Indexed find — the reference's entire read surface (S1-S5, P1-P8).

The storage engine of the reference has exactly one read operator:
``find(indexName, keys[], comparator ∈ {EQ,LT,LE,GT,GE}, limit, offset)``
(DatabaseExecutor.java:82-92), rendered to
``SELECT * FROM t WHERE col CMP 'v' [AND ...] LIMIT offset,limit``
(DatabaseExecutorForMysqlClient.java:83-120).  Composite indexes are
prefix-matched: a 2-column index may be probed with 1 key
(FileRepository.findByParentId :73-78) or 2
(findByParentIdAndName :67-71); null keys render ``IS NULL``
(DatabaseExecutorForMysqlClient.java:94).  The TDH executor adds ``IN``
(TDHSCommon.FindFlag :51-64) and column projection.

Spark-first expression: the whole thing is a conjunctive filter over an
(implicitly sorted) scan plus limit/offset.  Catalyst pushes the
predicates into the parquet scan (row-group pruning stands in for the
B-tree index) and prunes columns for the projection — the physical
"index" becomes file layout, which :mod:`adfs_spark.storage` controls
by sorting data files on the primary key.

Determinism note (SURVEY §7 hard-part c): LIMIT/OFFSET is only
well-defined under a total order, so this operator *always* sorts on
``order_cols`` (default: the index columns) before applying them.
"""

from __future__ import annotations

from enum import Enum
from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Comparator(str, Enum):
    """Comparator set of DatabaseExecutor.Comparator (:44-55) plus the
    TDH extension IN (TDHSCommon.FindFlag :51-64)."""

    EQ = "="
    LT = "<"
    LE = "<="
    GT = ">"
    GE = ">="
    IN = "in"

    def apply(self, col: Column, key: Any) -> Column:
        if key is None:
            # IS NULL probe (DatabaseExecutorForMysqlClient.java:94)
            return col.isNull()
        if self is Comparator.EQ:
            return col == F.lit(key)
        if self is Comparator.LT:
            return col < F.lit(key)
        if self is Comparator.LE:
            return col <= F.lit(key)
        if self is Comparator.GT:
            return col > F.lit(key)
        if self is Comparator.GE:
            return col >= F.lit(key)
        if self is Comparator.IN:
            return col.isin(list(key))
        raise ValueError(self)


def index_predicate(
    index_cols: Sequence[str], keys: Sequence[Any], cmp: Comparator = Comparator.EQ
) -> Column:
    """Build the prefix-match predicate: EQ on every key except the last,
    which uses ``cmp`` — the semantics of a B-tree range probe on a
    composite index (the reference's SQL builder loop,
    DatabaseExecutorForMysqlClient.java:90-97, skips absent key parts).
    """
    if not keys:
        raise ValueError("at least one key required")
    if len(keys) > len(index_cols):
        raise ValueError(f"{len(keys)} keys for {len(index_cols)}-column index")
    parts = [Comparator.EQ.apply(F.col(c), k) for c, k in zip(index_cols, keys[:-1])]
    parts.append(cmp.apply(F.col(index_cols[len(keys) - 1]), keys[-1]))
    return reduce(lambda a, b: a & b, parts)


def indexed_find(
    df: DataFrame,
    index_cols: Sequence[str],
    keys: Sequence[Any],
    cmp: Comparator = Comparator.EQ,
    limit: int | None = None,
    offset: int = 0,
    order_cols: Sequence[str] | None = None,
    projection: Sequence[str] | None = None,
) -> DataFrame:
    """S1: the indexed find. Filter + deterministic sort + offset/limit
    + optional projection (S4's TDH ``select(fields)``)."""
    out = df.filter(index_predicate(index_cols, keys, cmp))
    if offset or limit is not None:
        order_cols = list(order_cols or index_cols)
        out = out.orderBy(*order_cols)
        if offset:
            out = out.offset(offset)
        if limit is not None:
            out = out.limit(limit)
    if projection is not None:
        out = out.select(*projection)
    return out


def full_scan(df: DataFrame) -> DataFrame:
    """S5: find(PK, [MIN_VALUE], GE, MAX_INT) — a trivial scan
    (BlockRepository.findAll :42-46)."""
    return df


def live_view(df: DataFrame, version_col: str = "version") -> DataFrame:
    """P5: strip tombstones (rows with version < 0) — removeDeletedRows,
    DistributedDataRepositoryBaseOnTable.java:481-488."""
    return df.filter(F.col(version_col) >= 0)


def paginate(
    df: DataFrame,
    order_cols: Sequence[str],
    start_after: Any | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Keyset pagination for listings — the fork *ignores* its
    ``startAfter`` parameter (FSNamesystem.getListing :1658-1661); we do
    it properly: ``name > startAfter ORDER BY name LIMIT n``.  Keyset
    beats OFFSET at scale: the predicate pushes into the scan instead of
    discarding ``offset`` rows per page.
    """
    key = order_cols[0]
    out = df
    if start_after is not None:
        out = out.filter(F.col(key) > F.lit(start_after))
    out = out.orderBy(*order_cols)
    if limit is not None:
        out = out.limit(limit)
    return out


def is_valid(df: DataFrame, index_cols: Sequence[str], keys: Sequence[Any]) -> bool:
    """P7: row-validity probe — point find succeeds
    (FileRepository.java:140-147)."""
    return bool(df.filter(index_predicate(index_cols, keys)).limit(1).take(1))
