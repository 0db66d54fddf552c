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
