#!/usr/bin/env python
"""10× scale smoke: replicate the sf0.1 fixtures to ~sf1 with shifted
keys, run the heavy headline queries at both scales, and print the
per-query scaling ratio.

A ratio near the data growth (10×) for scan-bound work, and below it
for per-group or candidate-driven work, is the evidence that the plans
hold when the data grows — the local complement to the plan-shape tests
in tests/test_plans.py.  Results are recorded in SCALE.md §10.

Usage: python tools/scale_smoke.py  (writes the scaled copy to a temp
dir; ~1 GB of disk, a few minutes of compute)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
KEY_STRIDE = 10_000_000

# query -> tables it loads (only these get scaled copies)
QUERIES_TABLES = {
    "q1_pricing_summary": ("lineitem",),
    "q6_filtered_revenue": ("lineitem",),
    "a2_group_argmax": ("lineitem",),
    "a3_sum_per_parent": ("lineitem",),
    "text_tfidf_top_terms": ("documents",),
    "dedup_minhash_lsh": ("documents",),
}

KEY_COLS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "documents": ("doc_id",),
}


def scale_table(spark, name: str, dest: str) -> None:
    from pyspark.sql import functions as F

    from adfs_spark.catalog import load_table

    base = load_table(spark, SF_DIR, name)
    parts = []
    for i in range(COPIES):
        df = base
        for k in KEY_COLS[name]:
            df = df.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE))
        if name == "documents" and i > 0:
            # distinct content per copy: the dedup/text work must really
            # grow 10x (identical copies would exact-collapse away)
            df = df.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copymarker{i}"))
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dest, f"{name}.parquet")
    )


def main() -> int:
    from adfs_spark.queries import QUERIES
    from adfs_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    tables = sorted({t for ts in QUERIES_TABLES.values() for t in ts})
    dest = tempfile.mkdtemp(prefix="scale_smoke_")
    for t in tables:
        scale_table(spark, t, dest)

    def run(name: str, sf_dir: str) -> float:
        fn, _ = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    print(f"{'query':<28}{'sf0.1':>9}{'x' + str(COPIES):>9}{'ratio':>8}")
    for name in QUERIES_TABLES:
        t_small = run(name, SF_DIR)
        t_big = run(name, dest)
        print(
            f"{name:<28}{t_small:>8.2f}s{t_big:>8.2f}s{t_big / t_small:>8.1f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
