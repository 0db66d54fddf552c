"""Small shared helpers for the functions layer."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bind(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Column-level let-binding: evaluate ``expr`` ONCE per row and
    pass the bound value into ``body``.

    A non-trivial expression referenced inside a higher-order
    function's lambda body is RE-EVALUATED on every element visit —
    lambda bodies run interpreted per element, and only the HOF's
    direct input is evaluated once.  A ``split()`` captured by a
    per-shingle lambda therefore re-tokenizes the document once per
    shingle position, turning O(tokens) tokenization into O(tokens²)
    (measured 8.6× end-to-end on window-8 span fingerprints over
    300-token docs).  Wrapping the expression as the single element of
    a ``transform`` rebinds it as a lambda VARIABLE — O(1) to
    reference from any nesting depth — while keeping the Column →
    Column shape (no named intermediate column needed)."""
    return F.element_at(F.transform(F.array(expr), body), 1)


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Fan a narrow input out to the cluster's parallelism.

    CPU-heavy per-row stages (shingling, hashing, scoring) inherit the
    input's partitioning; a small parquet file arrives as ONE split, so
    on a 32-core executor 31 cores idle.  At real scale inputs span
    many splits and this is a no-op (we only repartition when the
    current partition count is below the default parallelism).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
