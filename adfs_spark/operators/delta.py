"""Delta / CDC operators D2 + U4 as pure DataFrame functions.

:mod:`adfs_spark.storage` applies these against persisted tables; the
pure forms here are what the correctness harness replays on arbitrary
change-log shaped DataFrames.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def version_range(
    log: DataFrame, from_version: int, to_version: int, version_col: str = "version"
) -> DataFrame:
    """D2: rows with abs(version) ∈ [from, to]
    (getDataIncrement, DistributedDataBaseOnDatabase.java:221-249)."""
    return log.filter(F.abs(F.col(version_col)).between(from_version, to_version))


def merge_last_writer_wins(
    base: DataFrame,
    updates: DataFrame,
    pk: Sequence[str],
    version_col: str = "version",
) -> DataFrame:
    """U4: idempotent merge — for each pk keep the row with the highest
    abs(version) (insert/update/deleteDirectly :420-470: apply only if
    incoming |version| ≥ stored |version|).

    One shuffle on pk; at scale pre-bucket both sides on pk to make it
    co-located.  Tombstones (version < 0) survive the merge so a later
    ``live_view`` strips them — exactly the reference's 4-case
    reconciliation (setDataIncrement :251-280).
    """
    all_rows = base.select(*updates.columns).unionByName(updates)
    w = Window.partitionBy(*pk).orderBy(F.abs(F.col(version_col)).desc())
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def changelog_of(
    df: DataFrame,
    pk: Sequence[str],
    version_col: str = "version",
    op_col: str = "_op",
) -> DataFrame:
    """D1 view: classify change-log rows into INSERT/UPDATE/DELETE by
    tombstone sign and first-appearance (first version per pk = INSERT).
    """
    w = Window.partitionBy(*pk).orderBy(F.abs(F.col(version_col)))
    rn = F.row_number().over(w)
    op = (
        F.when(F.col(version_col) < 0, "DELETE")
        .when(rn == 1, "INSERT")
        .otherwise("UPDATE")
    )
    return df.withColumn(op_col, op)


def table_diff(
    left: DataFrame,
    right: DataFrame,
    pk: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Anti-entropy diff of two table states: one row per divergent
    key, classified ``added`` (only in right), ``removed`` (only in
    left), or ``changed`` (present in both, compared columns differ).

    Generalizes the block-report reconciliation (J5/D7,
    FSNamesystem.processReport :2468-2620) from key-presence to value
    equality: a single full-outer join on the pk — both sides shuffle
    once on the same key (zero extra shuffles when both are bucketed on
    the pk).  Null-safe equality (`eqNullSafe`) so NULL↔value edits
    classify as changed.
    """
    cmp_cols = list(compare_cols) if compare_cols is not None else [
        c for c in left.columns if c not in pk
    ]
    # string-qualified refs ("l.c"/"r.c") — the two sides may share
    # lineage (replica derived from master), where df[col] accessors
    # are ambiguous.  Presence is tested with a per-side TRUE marker,
    # not pk-nullness: a genuinely-NULL pk column joins via eqNullSafe,
    # so pk IS NULL cannot distinguish "absent side" from "null key".
    l = left.select(*pk, *cmp_cols, F.lit(True).alias("_lpresent")).alias("l")
    r = right.select(*pk, *cmp_cols, F.lit(True).alias("_rpresent")).alias("r")
    lc = lambda c: F.col(f"l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"r.{c}")  # noqa: E731
    cond = lc(pk[0]).eqNullSafe(rc(pk[0]))
    for c in pk[1:]:
        cond = cond & lc(c).eqNullSafe(rc(c))
    same_vals = F.lit(True)
    for c in cmp_cols:
        same_vals = same_vals & lc(c).eqNullSafe(rc(c))
    return (
        l.join(r, cond, "full_outer")
        .withColumn(
            "diff",
            F.when(lc("_lpresent").isNull(), F.lit("added"))
            .when(rc("_rpresent").isNull(), F.lit("removed"))
            .when(~same_vals, F.lit("changed")),
        )
        .filter(F.col("diff").isNotNull())
        .select(
            *[F.coalesce(lc(c), rc(c)).alias(c) for c in pk],
            "diff",
        )
    )
