#!/usr/bin/env python
"""r10 (verdict ask #5): interleaved same-host A/B of w_bulk_init with
and without the r9.4 init-seed persist — the driver's r9 artifact read
w_bulk_init 4.541 s on a loaded host (r8: 2.914) and fd8340b touched
init directly, so the regression claim needs an isolated measurement.

Replicates the bench's w_bulk_init shape (orders slice, 64-bucket
VersionedTable, fresh root per round).  Toggle = the persist size gate
(SPARK_GRAFT_WRITE_PERSIST_MAX is read at import, so the off-side sets
the module constant directly).

Usage: python tools/init_persist_ab_r10.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import adfs_spark.storage as storage  # noqa: E402
from adfs_spark.catalog import load_table  # noqa: E402
from adfs_spark.schema import ColumnSpec, TableSpec  # noqa: E402
from adfs_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def bench_init(spark, rows, spec, persist_on: bool) -> float:
    saved = storage.WRITE_BATCH_PERSIST_MAX_BYTES
    storage.WRITE_BATCH_PERSIST_MAX_BYTES = saved if persist_on else 0
    root = tempfile.mkdtemp(prefix="init_ab_")
    try:
        t = storage.VersionedTable(
            spark, spec, os.path.join(root, "t"), num_buckets=64
        )
        t0 = time.time()
        t.init(rows)
        return time.time() - t0
    finally:
        storage.WRITE_BATCH_PERSIST_MAX_BYTES = saved
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark("init-persist-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    rows = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("parentId"),
        F.col("o_orderstatus").alias("name"),
    )
    spec = TableSpec(
        name="init_ab",
        columns=(
            ColumnSpec("id", "long"),
            ColumnSpec("parentId", "long"),
            ColumnSpec("name", "string"),
        ),
        primary_key=("id",),
        versioned=True,
    )
    rows.count()  # warm the fixture scan
    res = {"persist_on": [], "persist_off": []}
    for r in range(ROUNDS):
        for label, on in (("persist_on", True), ("persist_off", False)):
            spark.sparkContext.setJobDescription(f"init-ab {label} r{r}")
            res[label].append(round(bench_init(spark, rows, spec, on), 3))
    for k, v in res.items():
        print(f"{k}: passes={v} best={min(v):.3f} mean={sum(v)/len(v):.3f}")


if __name__ == "__main__":
    main()
