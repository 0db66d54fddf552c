"""Operator library — SURVEY.md §2 as pure DataFrame→DataFrame functions."""

from adfs_spark.operators.find import Comparator, indexed_find, live_view, paginate
from adfs_spark.operators.aggregates import argmax_rows, group_argmax
from adfs_spark.operators.hierarchy import (
    children,
    descendants,
    path_column,
    resolve_path,
)

__all__ = [
    "Comparator",
    "indexed_find",
    "live_view",
    "paginate",
    "argmax_rows",
    "group_argmax",
    "children",
    "descendants",
    "path_column",
    "resolve_path",
]
