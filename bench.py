#!/usr/bin/env python
"""Headline benchmark — runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
collect) so timings measure the distributed plan, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Large-SF runs (tools-driven, e.g. sf100) dial these down; the driver's
# per-round sf0.1 run uses the defaults.
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
RUN_COLD = os.environ.get("SPARK_GRAFT_BENCH_COLD", "1") == "1"
RUN_WRITES = os.environ.get("SPARK_GRAFT_BENCH_WRITES", "1") == "1"

# Representative slice of the suite: scans, the big joins/aggs, argmax,
# anti-join diff, LWW merge, hierarchy, text/dedup/similarity extensions.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_nation_revenue",
    "q6_filtered_revenue",
    "q14_promo_revenue",
    "j1_fact_join",
    "j5_anti_stored",
    "a2_group_argmax",
    "a3_sum_per_parent",
    "w2_topk_per_group",
    "u4_lww_merge",
    "h2_path_column",
    "events_hourly_window",
    "events_latest_per_user",
    "text_quality_ratios",
    "text_tfidf_top_terms",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "asof_click_after_error",
    "pipeline_split_counts",
]


def bench_writes(spark) -> dict[str, float]:
    """Write-path benchmarks over the bucketed VersionedTable (the
    engine's most novel storage code): bulk init, a uniform 1% upsert
    (touches every bucket — worst-case rewrite amplification), a
    10-key point upsert (bucket pruning pays: only the touched pk-hash
    partitions are read+rewritten), a 2% tombstone delete, and a
    compact.  One shot each — writes are not idempotent, so no
    best-of-N; treat ±35% host noise accordingly."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from adfs_spark.catalog import load_table
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable

    spec = TableSpec(
        name="bench_kv",
        columns=(
            ColumnSpec("k", "long"),
            ColumnSpec("v", "double"),
            ColumnSpec("s", "string"),
        ),
        primary_key=("k",),
        versioned=True,
    )
    rows = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v"),
        F.col("o_orderpriority").alias("s"),
    )
    root = tempfile.mkdtemp(prefix="adfs_bench_w_")
    t = VersionedTable(spark, spec, root, num_buckets=64)
    out: dict[str, float] = {}

    def step(name: str, fn) -> None:
        t0 = time.time()
        fn()
        out[name] = round(time.time() - t0, 3)

    step("w_bulk_init", lambda: t.init(rows))
    step(
        "w_upsert_1pct",
        lambda: t.upsert(
            rows.filter(F.col("k") % 100 == 0).withColumn("v", F.col("v") + 1.0)
        ),
    )
    step(
        "w_upsert_point",
        lambda: t.upsert(
            rows.filter(F.col("k") < 10).withColumn("v", F.col("v") + 2.0)
        ),
    )
    step("w_delete_2pct", lambda: t.delete_where(F.col("k") % 50 == 1))
    step("w_compact", lambda: t.compact())
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    from adfs_spark.queries import QUERIES
    from adfs_spark.session import get_spark

    spark = get_spark("adfs-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Cold pass: run (and time) the whole suite once from a fresh JVM.
    # One-time costs (classloading, whole-stage-codegen compilation,
    # JIT) dominate single-shot timings at this scale — e.g. the
    # MinHash pipeline measures ~10s cold but ~2.6s steady-state — and
    # a long-running cluster never pays them per query.  The cold total
    # is REPORTED (so round-over-round comparisons can't hide JIT
    # effects) but the headline is the steady-state suite below, which
    # measures the distributed plan — what the engine controls.
    spark.range(1000).count()
    cold: dict[str, float] = {}
    if RUN_COLD:
        for name in BENCH_QUERIES:
            fn, _ = QUERIES[name]
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.time() - t0, 3)

    # Best-of-5 timed passes: single-shot timings at sub-second scale
    # swing 2-4x on JVM GC pauses and host co-tenancy noise (observed
    # ±35% on identical runs minutes apart); the min over 5 passes is
    # the reproducible cost of the plan itself.
    timings: dict[str, float] = {}
    for _pass in range(PASSES):
        for name in BENCH_QUERIES:
            fn, _ = QUERIES[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            t = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, t), t)

    writes = bench_writes(spark) if RUN_WRITES else {}

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "writes": writes,
                "write_total_sec": round(sum(writes.values()), 3),
                "cold_total_sec": round(sum(cold.values()), 3),
                "sf": float(sf),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
