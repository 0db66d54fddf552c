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


def global_row_number(
    df: DataFrame,
    key_col: str,
    tiebreak: Sequence[str],
    out_col: str = "_rn",
    num_buckets: int = 32,
) -> tuple[DataFrame, int]:
    """Dense global row numbers in ascending (key_col, *tiebreak) order
    WITHOUT a single-partition window — the two-pass partition-offset
    scheme (the version-stamping / shuffle_order pattern applied to an
    arbitrary numeric sort key):

    1. driver-side approx-quantile cutpoints on ``key_col`` (≤
       ``num_buckets`` doubles of metadata) range-bucket the rows with
       a STRICT ``cut < key`` comparison, so key ties always land in
       one bucket and the within-bucket (key, tiebreak) sort extends to
       a correct global order;
    2. per-bucket counts (≤ num_buckets longs) become cumulative
       offsets; each bucket numbers locally.

    One hash-partitioned exchange, no global funnel.  Returns
    (df + out_col, total rows) — the row count rides along free for
    ntile/percent_rank arithmetic.
    """
    qs = [i / num_buckets for i in range(1, num_buckets)]
    cuts = sorted(set(df.approxQuantile(key_col, qs, 0.001)))
    if cuts:
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, c: acc + F.when(c < F.col(key_col), 1).otherwise(0),
        )
    else:
        bucket = F.lit(0)
    tagged = df.withColumn("_gb", bucket)
    counts = {r["_gb"]: r["count"] for r in tagged.groupBy("_gb").count().collect()}
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = (
        F.create_map(*[F.lit(x) for bo in offsets.items() for x in bo])[F.col("_gb")]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_gb").orderBy(key_col, *tiebreak)
    return (
        tagged.withColumn(out_col, (off + F.row_number().over(w)).cast("long")).drop("_gb"),
        acc,
    )


def ntile_of(rn: Column, n_rows: int, n_tiles: int) -> Column:
    """ntile(n_tiles) reconstructed from a global row number by
    arithmetic (the first ``n_rows % n_tiles`` tiles get one extra
    row, exactly Spark's NTile): turns the rank-family's unpartitioned
    window into per-row math over the two-pass numbering."""
    base, rem = n_rows // n_tiles, n_rows % n_tiles
    cutoff = rem * (base + 1)
    big = F.ceil(rn / F.lit(base + 1))
    small = F.lit(rem) + F.ceil((rn - F.lit(cutoff)) / F.lit(max(base, 1)))
    return (F.when(rn <= cutoff, big).otherwise(small)).cast("int")
