#!/usr/bin/env python
"""r10 A/B: dedup_minhash_incremental probing a LIVE index plan vs a
MATERIALIZED index table (the minhash_index docstring's deployment
shape, adopted by the query wrapper this round).

With a live index the batch probe's plan tree contains the whole
corpus signature pipeline and the optimizer re-plans it per consumer
(417 exchanges at the r9 sf0.001 dump); materializing the index
between phases flattens the probe to a parquet scan.  Results are
identical (the index rows are the same).

Usage: python tools/incr_index_ab_r10.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from adfs_spark.catalog import load_table  # noqa: E402
from adfs_spark.functions.dedup import (  # noqa: E402
    minhash_dedup_incremental,
    minhash_index,
)
from adfs_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def run_once(spark, materialize: bool) -> tuple[float, int]:
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    persisted: list = []
    t0 = time.time()
    idx = minhash_index(corpus, "doc_id", "text")
    tmp = None
    if materialize:
        tmp = tempfile.mkdtemp(prefix="adfs_mhidx_ab_")
        idx.write.parquet(os.path.join(tmp, "idx"))
        idx = spark.read.parquet(os.path.join(tmp, "idx"))
    pairs = minhash_dedup_incremental(
        new, corpus, idx, "doc_id", "text", persisted_out=persisted
    ).select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))
    pairs.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    n = pairs.count()
    for p in persisted:
        try:
            p.unpersist()
        except Exception:
            pass
    spark.catalog.clearCache()
    if tmp:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return dt, n


def plan_text(spark, materialize: bool) -> str:
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    idx = minhash_index(corpus, "doc_id", "text")
    tmp = None
    if materialize:
        tmp = tempfile.mkdtemp(prefix="adfs_mhidx_plan_")
        idx.write.parquet(os.path.join(tmp, "idx"))
        idx = spark.read.parquet(os.path.join(tmp, "idx"))
    pairs = minhash_dedup_incremental(
        new, corpus, idx, "doc_id", "text"
    ).select("id_a", "id_b", F.round("jaccard", 5).alias("jaccard"))
    txt = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    spark.catalog.clearCache()
    return txt


def main() -> None:
    spark = get_spark("incr-index-ab-r10")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM
    spark.range(1000).count()
    results = {"live": [], "materialized": []}
    rows = {}
    for r in range(ROUNDS):
        for label, mat in (("live", False), ("materialized", True)):
            spark.sparkContext.setJobDescription(f"incr-ab {label} r{r}")
            dt, n = run_once(spark, mat)
            results[label].append(round(dt, 3))
            rows[label] = n
    print("rows:", rows)
    assert rows["live"] == rows["materialized"], "result row counts differ!"
    for label in results:
        print(
            f"{label}: passes={results[label]} best={min(results[label]):.3f}"
        )
    for label, mat in (("before", False), ("after", True)):
        txt = plan_text(spark, mat)
        exch = txt.count("Exchange")
        path = f"plans/r10/dedup_minhash_incremental_{label}.txt"
        os.makedirs("plans/r10", exist_ok=True)
        with open(path, "w") as f:
            f.write(txt)
        print(f"{label}: exchanges={exch} -> {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
