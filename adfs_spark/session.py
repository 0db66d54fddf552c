"""SparkSession construction with scale-appropriate defaults.

Local testing runs on ``local[N]``; the config block is written for a
real cluster too — AQE on (runtime re-planning, skew-join splitting,
partition coalescing), broadcast threshold sized for dimension tables,
and Arrow enabled for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "adfs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    At 100 TB the same settings hold: AQE coalesces the statically
    over-provisioned shuffle partitions and splits skewed ones, so we
    set ``spark.sql.shuffle.partitions`` high and let runtime stats
    shrink it rather than hand-tuning per query.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The fixture events table stores TIMESTAMP(NANOS) which the
        # Spark parquet reader rejects; read as long and convert in the
        # catalog layer (catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # take(n)/limit collection defaults to trying ONE partition and
        # growing by scaleUpFactor — for the write path's bounded hit
        # scans (predicates matching a few hundred rows spread across
        # every partition) that is 3-4 SEQUENTIAL tiny jobs per write.
        # Start limit scans wide: one job over up to shuffle-width
        # partitions, which is the fixed floor of a small mutation.
        .config(
            "spark.sql.limit.initialNumPartitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
