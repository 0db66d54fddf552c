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
