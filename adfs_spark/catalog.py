"""Load the driver's parquet fixture tables and register temp views.

The test tables (TESTDATA.md) live one-parquet-per-table under an
``sf`` directory; at cluster scale the same call reads a partitioned
directory tree — nothing here assumes single files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Bucketed-layout overrides: (sf_dir, table) → saved catalog table
# name.  When staged (stage_bucketed_layout), load_table serves the
# bucketed table instead of the plain parquet — the whole query suite
# then runs on the co-located layout WITHOUT any query changing, which
# is exactly how a 100 TB deployment adopts bucketing: re-stage the
# fact tables once, leave every reader untouched.
_LAYOUT_OVERRIDES: dict[tuple[str, str], str] = {}


def stage_bucketed_layout(
    spark: SparkSession,
    sf_dir: str,
    keys: dict[str, tuple[str, ...]],
    num_buckets: int = 32,
) -> float:
    """Stage the given fixture tables as bucketed saved tables and
    register them as load_table overrides for ``sf_dir``.  Returns the
    staging wall time — the once-per-layout cost, always reported
    separately from query times."""
    import time

    from adfs_spark.sources.generic import write_bucketed_table

    t0 = time.time()
    for name, key_cols in keys.items():
        tbl = f"layout_{name}_bkt"
        write_bucketed_table(
            load_table(spark, sf_dir, name), tbl, key_cols, num_buckets=num_buckets
        )
        _LAYOUT_OVERRIDES[(sf_dir, name)] = tbl
    return time.time() - t0


def clear_bucketed_layout(spark: SparkSession) -> None:
    for (sf_dir, name), tbl in list(_LAYOUT_OVERRIDES.items()):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    _LAYOUT_OVERRIDES.clear()


# Schema cache for the fixture reads: ``spark.read.parquet`` runs
# parquet schema INFERENCE on every call (~110 ms of driver-side
# DataSource resolution + footer reads, measured at sf0.1) — pure
# metadata overhead repaid on every query invocation.  Caching the
# inferred StructType per path and passing it explicitly is the same
# class of metadata caching Spark itself applies to file listings
# (guide §6): no row or result is memoized, every action still scans
# the parquet inputs.  Keyed by (path, mtime_ns, size) so a fixture
# rewritten at the same path in-process re-infers instead of being
# silently read with the stale schema (r9 advice); the stat is one
# syscall against the ~110 ms inference it replaces.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _read_fixture_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = (path, None, None)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        sch = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = sch
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    override = _LAYOUT_OVERRIDES.get((sf_dir, name))
    if override is not None:
        return spark.table(override)
    if name == "events":
        # Normalize ts to TIMESTAMP (LTZ) whatever the file stores —
        # fixture generations have used TIMESTAMP(NANOS) (readable only
        # as long nanos via the legacy conf) and TIMESTAMP_NTZ micros.
        # The session timezone is UTC, so NTZ→LTZ preserves values, and
        # epoch extraction (unix_micros) then matches the DuckDB
        # oracle's epoch arithmetic on the same file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_fixture_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_fixture_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


_INGEST_SPLIT_THRESHOLD = 1 << 20  # files below 1 MB stay single-part


def ingest_native(
    spark: SparkSession,
    sf_dir: str,
    dest_dir: str,
    tables: tuple[str, ...] = TPCH_TABLES,
    target_files: int | None = None,
) -> str:
    """One-time ingest of the fixture tables into the engine's native
    multi-file layout (SCALE.md §2) — the same load-into-storage
    operating model as the reference, which serves queries from its own
    MySQL tables, never from interchange files.

    The driver's fixtures are one single-row-group parquet file per
    table; a row group is the atomic parquet split unit, so every scan
    of such a file is ONE task no matter the cluster size.  Rewriting
    big tables as ``target_files`` parts (default: the local CPU
    count) restores source parallelism for all downstream scans.
    Values are byte-identical; sub-megabyte dims stay single-part.
    Idempotent: a marker file skips completed ingests.
    """
    marker = os.path.join(dest_dir, "_INGESTED")
    if os.path.exists(marker):
        return dest_dir
    os.makedirs(dest_dir, exist_ok=True)
    n_default = target_files or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for t in tables:
        src = os.path.join(sf_dir, f"{t}.parquet")
        n = n_default if os.path.getsize(src) >= _INGEST_SPLIT_THRESHOLD else 1
        load_table(spark, sf_dir, t).repartition(n).write.mode(
            "overwrite"
        ).parquet(os.path.join(dest_dir, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return dest_dir


def load_all(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in tables}


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    dfs = load_all(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
