"""Small shared helpers for the functions layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
