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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file, which the Spark reader
        # rejects unless surfaced as long nanos; set the (runtime-settable)
        # legacy conf here so externally-created sessions work too, then
        # convert to a proper timestamp (microsecond truncation is safe
        # for the second-granularity thresholds the queries use).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
