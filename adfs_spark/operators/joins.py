"""Join family J1-J8 — equi joins, dimension broadcasts, anti-join diff.

The reference performs every join application-side as index
nested-loop lookups (e.g. file⋈block via StateManager.findBlockByFilePath
:800-808, block⋈datanode via in-memory maps :295-305,336-373).  Spark
replaces all of that with declared equi-joins; the in-memory dimension
map pattern (O12) becomes an explicit ``broadcast()`` hint so the big
side never shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_join(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    how: str = "inner",
    broadcast_parent: bool = False,
) -> DataFrame:
    """J1/J2/J6/J8: generic 1→N / N→1 equi join on a foreign key.

    ``broadcast_parent=True`` is the O12 in-memory-dimension-map analog
    (reloadDatanodeDescriptorMaps :336-373): ship the small table to
    every executor, avoid shuffling the fact side entirely.
    """
    p = F.broadcast(parent) if broadcast_parent else parent
    return child.join(p, child[fk] == p[pk], how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Column) -> DataFrame:
    """J3: the loop-of-lookups driver (findBlockByFiles :810-818) is a
    semi-join: keep left rows whose key appears in right."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Column) -> DataFrame:
    """J5 building block: left rows with no match in right."""
    return left.join(right, on, "left_anti")


def report_diff(
    reported: DataFrame, stored: DataFrame, key_cols: Sequence[str]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """J5/D7: block-report reconciliation
    (FSNamesystem.processReport :2468-2620).

    Returns ``(to_add, to_remove, matched)``:
      - to_add     = reported ∖ stored   (reported but unknown)
      - to_remove  = stored ∖ reported   (stored but no longer reported)
      - matched    = inner join of both sides (for the genStamp/length
                     reconciliation CASE logic done by the caller)

    One shuffle on the key serves all three outputs when the inputs are
    pre-partitioned on ``key_cols``; at scale prefer bucketing both
    tables on the key so the anti/inner joins are co-located.
    """
    on = [reported[c] == stored[c] for c in key_cols]
    to_add = reported.join(stored, on, "left_anti")
    to_remove = stored.join(reported, on, "left_anti")
    matched = reported.alias("r").join(stored.alias("s"), on, "inner")
    return to_add, to_remove, matched


def report_classify(
    reported: DataFrame,
    stored: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
    class_col: str = "class",
) -> DataFrame:
    """J5 full form: the whole processReport reconciliation as ONE
    full-outer join + CASE (FSNamesystem.processReport :2468-2620 with
    the CorruptReplicasMap classification folded in):

      - ``added``   — reported, not stored (toAdd)
      - ``removed`` — stored, no longer reported (toRemove)
      - ``corrupt`` — present in both but a compared column (genStamp /
                      length) disagrees (markBlockAsCorrupt input)
      - ``ok``      — present and equal

    Single shuffle on the key; both classifications and the diff come
    out of the same join, so a 100 TB report never scans twice."""
    r = reported.select(
        *key_cols, *compare_cols, F.lit(True).alias("_rp")
    ).alias("r")
    s = stored.select(*key_cols, *compare_cols, F.lit(True).alias("_sp")).alias("s")
    cond = F.col(f"r.{key_cols[0]}").eqNullSafe(F.col(f"s.{key_cols[0]}"))
    for c in key_cols[1:]:
        cond = cond & F.col(f"r.{c}").eqNullSafe(F.col(f"s.{c}"))
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"r.{c}").eqNullSafe(F.col(f"s.{c}"))
    cls = (
        F.when(F.col("s._sp").isNull(), "added")
        .when(F.col("r._rp").isNull(), "removed")
        .when(~same, "corrupt")
        .otherwise("ok")
    )
    return r.join(s, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"r.{c}"), F.col(f"s.{c}")).alias(c)
            for c in key_cols
        ],
        cls.alias(class_col),
    )


def chain_join(
    levels: Sequence[DataFrame],
    keys: Sequence[tuple[str, str]],
    broadcast_upper: bool = True,
) -> DataFrame:
    """J4 (bounded form): k-step chain join — e.g. the 3-level
    region→nation→customer stand-in for path resolution
    (findFilesByPath :681-694 resolves one path component per step).

    ``levels[0]`` is the root (smallest) table; each step joins the next
    level on (parent_key_in_child == key_in_parent).  Upper levels are
    broadcast — path-resolution chains touch tiny ancestor sets while
    the leaf level is the big one, so the big table never shuffles.
    """
    acc = levels[0]
    for nxt, (child_fk, parent_pk) in zip(levels[1:], keys):
        left = F.broadcast(acc) if broadcast_upper else acc
        acc = nxt.join(left, nxt[child_fk] == left[parent_pk], "inner")
    return acc


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` in the same ``on`` group (pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics).

    The reference has no as-of operator (SURVEY §2.3: equi joins and
    time-threshold *filters* only); this is the training-pipeline
    extension for point-in-time lookups (feature stores, price/event
    alignment).

    Implementation is the distributed-canonical union + running-last
    window, NOT a range self-join: tag each side, union, and carry the
    most recent right row forward per key with ``last(..., ignorenulls)``
    over ``(key) ORDER BY (ts, tag)``.  One shuffle on the key, each
    input scanned once, state per key is a single struct — no
    candidate-pair explosion, so 100 TB of events costs a sort within
    key partitions (the floor for time alignment).  Ties at equal
    timestamp: the right row sorts first, so it IS visible to a left
    row at the same instant (<= semantics, matching DuckDB).
    """
    right_ts = right_ts or left_ts
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c != on
    ]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}

    rstruct = F.struct(*[F.col(c).alias(out_names[c]) for c in rcols]).alias("_r")
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        rstruct,
    )
    rtype = r2.schema["_r"].dataType
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(rtype).alias("_r"),
        F.struct(*left.columns).alias("_l"),
    )
    r2 = r2.withColumn("_l", F.lit(None).cast(l2.schema["_l"].dataType))

    from pyspark.sql import Window

    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{out_names[c]}").alias(out_names[c]) for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str | None = None,
    delta: int | float = 1,
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Band/range join: pairs rows with the same ``on`` key and
    ``right_ts ∈ (left_ts - delta, left_ts]`` (numeric ts columns —
    convert timestamps with ``unix_micros`` first).

    The reference has only time-threshold *filters* (SURVEY §2.7);
    this is the band-join extension.  A naive theta join degenerates
    to a per-key cross product; instead both sides are bucketed by
    ``floor(ts/delta)`` and the right side is duplicated into buckets
    ``(b, b+1)`` — any qualifying pair lands in exactly one equal
    bucket, so the join is a plain equi-join on (key, bucket) with the
    exact range as a residual filter.  Shuffle is 2×|right| + |left|
    keyed by (key, bucket); no candidate explosion beyond pairs within
    2·delta, which is the distributed floor for band joins.
    """
    right_ts = right_ts or left_ts
    rcols = [c for c in right.columns if c != on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}
    r2 = right.select(
        F.col(on).alias("_k"),
        *[F.col(c).alias(out_names[c]) for c in rcols],
    )
    rb = F.floor(F.col(out_names[right_ts]) / F.lit(delta))
    r2 = r2.withColumn("_b", F.explode(F.array(rb, rb + 1)))
    l2 = left.withColumn("_b", F.floor(F.col(left_ts) / F.lit(delta)))
    rts = r2[out_names[right_ts]]
    cond = (
        (l2[on] == r2["_k"])
        & (l2["_b"] == r2["_b"])
        & (rts > l2[left_ts] - F.lit(delta))
        & (rts <= l2[left_ts])
    )
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be 'inner' or 'left', got {how!r}")
    joined = l2.join(r2, cond, how)
    return joined.select(
        *[l2[c] for c in left.columns],
        *[r2[out_names[c]] for c in rcols],
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi join: spread a hot join key over ``num_salts``
    shuffle partitions.

    AQE's skew-join splitting (on by default, SCALE.md §5) handles most
    skew by splitting oversized *partitions*; it cannot split a single
    monster key whose rows all hash to one task.  Salting can: the
    skewed side gets a deterministic per-row salt
    (pmod(hash(monotonic id), n)), the other side is replicated
    ``num_salts``× via an explode, and the join key becomes
    (key, salt) — the monster key now occupies ``num_salts`` tasks.

    Use when one side has pathological key concentration (the
    reference's analog: a datanode holding millions of blocks) and the
    other side is too big to broadcast but small enough to replicate
    ``num_salts``×.  Output column set matches a plain ``join(key)``.
    """
    salted = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")
