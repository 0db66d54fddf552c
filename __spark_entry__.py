"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The harness verifies the FIRST 50 entries, so ``queries()`` exports
exactly 50 (``adfs_spark.queries.EXPORTED``): standalone queries plus
tagged-union suites whose oracles are composed from their members'
oracles — every declared operator gets a driver-checked row (see
COVERAGE.md for the member map).  All 50 carry full oracles — the
approximations included: LSH ANN uses deterministic md5-derived
hyperplanes the oracle regenerates bit-identically, SimHash uses
md5-derived bit hashes, IVF probes all cells (≡ exact top-k).

The real surface lives in :mod:`adfs_spark.queries`; this module is
the thin driver-facing veneer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from adfs_spark.queries import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from adfs_spark import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from adfs_spark import queries as Q

    return Q.oracle_sql()
