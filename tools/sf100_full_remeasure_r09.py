#!/usr/bin/env python
"""Round-9 close: re-measure EVERY headline row + writes at sf100 on
final HEAD with one consistent methodology — 48g heap, genuinely cold
page cache for the cold pass (drop_caches before launch), and
``spark.catalog.clearCache()`` after EVERY measurement so no row's
time contains another query's persisted frames (the mid-build run's
warm numbers lacked this and were partly cache substitution, see
OPTIMIZATION_r09.md).  Replaces ``queries_warm``/``writes`` in
BENCH_full_sf100.json wholesale and records provenance.

Usage:
  sync && echo 3 > /proc/sys/vm/drop_caches
  SPARK_GRAFT_DRIVER_MEM=48g python tools/sf100_full_remeasure_r09.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf100")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTE = (
    "r9-close full re-measure on final HEAD: one methodology for every "
    "row (48g heap, cold = single pass from dropped page caches, warm = "
    "best of 2 later passes, clearCache after every measurement)"
)


def main() -> int:
    import bench
    from adfs_spark.queries import QUERIES
    from adfs_spark.session import get_spark

    bench.SF_DIR = SF_DIR

    cal_start = bench.host_calibration()
    spark = get_spark("sf100-full-remeasure-r09")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in bench.BENCH_QUERIES:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"cold {name}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        print(f"cold {name}: {cold[name]}", flush=True)
        spark.catalog.clearCache()
    for _pass in range(2):
        for name in bench.BENCH_QUERIES:
            fn, _ = QUERIES[name]
            spark.sparkContext.setJobDescription(f"warm{_pass} {name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t = round(time.time() - t0, 3)
            warm[name] = min(warm.get(name, t), t)
            print(f"warm pass {_pass} {name}: {t}", flush=True)
            spark.catalog.clearCache()

    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription("writes")
    writes = bench.bench_writes(spark)
    print("writes", json.dumps(writes), flush=True)

    cal_end = bench.host_calibration()

    path = os.path.join(REPO, "BENCH_full_sf100.json")
    with open(path) as f:
        full = json.load(f)
    full["queries_warm"] = {k: warm[k] for k in bench.BENCH_QUERIES}
    full["queries_warm_total_sec"] = round(sum(warm.values()), 3)
    full["queries_cold_r9close"] = cold
    full["writes"] = dict(writes)
    full["write_total_sec"] = round(sum(writes.values()), 3)
    full["write_stats"] = dict(bench.WRITE_STATS) or full.get("write_stats", {})
    full["remeasure_r9close"] = {
        "note": NOTE,
        "host_load": {"start": cal_start, "end": cal_end},
    }
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps({"warm": warm, "writes": writes}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
