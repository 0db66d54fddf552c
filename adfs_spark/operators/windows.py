"""Window / ranking operators W1-W4.

W1 (argmax-per-group) lives in :mod:`aggregates` as the preferred
aggregation form; here are the genuinely window-shaped and
priority-queue-shaped operators.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from adfs_spark.operators.aggregates import argmax_rows, group_argmax


def last_by_ordinal(df: DataFrame, group_col: str, ordinal_col: str) -> DataFrame:
    """W2: order group members by an ordinal and keep the last — the
    last block of a file by fileIndex (BlockEntry.compareTo :119-122,
    getLastBlockEntry :166-168)."""
    return group_argmax(df, [group_col], [ordinal_col], descending=True)


def priority_bucket(
    df: DataFrame,
    rules: Sequence[tuple[Column, int]],
    default: int,
    out_col: str = "priority",
) -> DataFrame:
    """W3: bucket rows into priority levels — the 3-level
    under-replication queue (UnderReplicatedBlocks.getPriority :70-107):
    a CASE/WHEN chain, then callers sort/limit on the bucket."""
    expr: Column | None = None
    for cond, level in rules:
        expr = F.when(cond, level) if expr is None else expr.when(cond, level)
    assert expr is not None
    return df.withColumn(out_col, expr.otherwise(default))


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """§2.6: global top-k = orderBy + limit; Spark executes this as
    TakeOrderedAndProject (per-partition heap + driver merge) — no full
    sort, no full shuffle. Pass a unique tiebreaker for determinism."""
    return df.orderBy(*order_by).limit(k)


def pick_one_per_group(
    df: DataFrame, group_col: str, order_by: Sequence[Column] | None = None, seed: int | None = None
) -> DataFrame:
    """W4: pick one row per group — one datanode per ip
    (getDatanodeDescriptorByDatanodeIp :307-318). Deterministic when
    ``order_by`` given; random-but-seeded otherwise."""
    order = list(order_by) if order_by else [F.rand(seed if seed is not None else 42)]
    return argmax_rows(df, [group_col], order, k=1)


def bucketed_queues(
    df: DataFrame,
    priority_col: str = "priority",
    limit_per_bucket: int | None = None,
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """W3 companion: per-priority-bucket ranked queue.  ``order_by``
    defines the within-bucket rank (e.g. lowest replica count first);
    required whenever ``limit_per_bucket`` is set, otherwise the kept
    subset would be an arbitrary row order."""
    if limit_per_bucket is not None and not order_by:
        raise ValueError("limit_per_bucket requires order_by (deterministic rank)")
    order = list(order_by) if order_by else [F.col(priority_col)]
    w = Window.partitionBy(priority_col).orderBy(*order)
    out = df.withColumn("_qpos", F.row_number().over(w))
    if limit_per_bucket is not None:
        out = out.filter(F.col("_qpos") <= limit_per_bucket)
    return out.drop("_qpos")
