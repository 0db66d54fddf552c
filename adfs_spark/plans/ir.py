"""The storage-engine IR, serializable.

The reference's *entire* logical plan for a storage read is the tuple
``(tableDescription, indexName, String[] keys, Comparator, limit,
offset)`` shipped from repository to executor (SURVEY §3a step 4;
DatabaseExecutor.find :82-92).  Its cross-node form is the reflective
``Invocation`` (RPC.java).  Here that IR becomes a small dataclass that
(a) round-trips through JSON — so plans can be logged, shipped, and
replayed — and (b) lowers onto :func:`indexed_find`, after which
Catalyst owns all further planning.

This is deliberately thin: anything richer than an indexed find is
expressed directly in the DataFrame algebra (SURVEY §4: the reference
has no optimizer to mirror — Catalyst replaces it wholesale).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame

from adfs_spark.operators.find import Comparator, indexed_find


@dataclass(frozen=True)
class FindPlan:
    """One storage read: indexed find with comparator/limit/offset."""

    table: str
    index_columns: tuple[str, ...]
    keys: tuple[Any, ...]
    comparator: str = "EQ"  # Comparator name
    limit: int | None = None
    offset: int = 0
    projection: tuple[str, ...] | None = None

    def to_json(self) -> str:
        return json.dumps(asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "FindPlan":
        return plan_from_dict(json.loads(s))


def plan_from_dict(d: dict) -> FindPlan:
    return FindPlan(
        table=d["table"],
        index_columns=tuple(d["index_columns"]),
        keys=tuple(d["keys"]),
        comparator=d.get("comparator", "EQ"),
        limit=d.get("limit"),
        offset=d.get("offset", 0),
        projection=tuple(d["projection"]) if d.get("projection") else None,
    )


def execute_plan(plan: FindPlan, catalog: dict[str, DataFrame]) -> DataFrame:
    """Lower the IR onto the operator library against a table catalog."""
    if plan.table not in catalog:
        raise KeyError(f"unknown table: {plan.table}")
    return indexed_find(
        catalog[plan.table],
        list(plan.index_columns),
        list(plan.keys),
        cmp=Comparator[plan.comparator],
        limit=plan.limit,
        offset=plan.offset,
        projection=list(plan.projection) if plan.projection else None,
    )
