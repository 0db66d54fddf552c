#!/usr/bin/env python
"""Round-9 final-HEAD sf100 spot-check.

The mid-build sf100 re-measure (6d742b9) predates the four round-9
optimization commits (42e7ba0 q5 early restrict, 5f34ae9 longsum /
packed top-k / minhash auto-guard / tfidf spread, fb37cb9 bucketed
write clustering, ad7782f probe-by-corpus-size).  This re-measures
exactly the rows those commits touch at sf100 on final HEAD and
patches them into BENCH_full_sf100.json with provenance, keeping the
mid-build values under ``queries_warm_r9midbuild`` / ``writes_r9midbuild``.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/fixtures/sf100 python
tools/sf100_spotcheck_r09.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf100")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTE = "r9 final-HEAD targeted run (post 42e7ba0/5f34ae9/fb37cb9/ad7782f)"

# The queries whose plans changed after the mid-build sf100 measure.
TOUCHED = [
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_nation_revenue",
    "a3_sum_per_parent",
    "w2_topk_per_group",
    "text_tfidf_top_terms",
    "dedup_minhash_lsh",
]


def main() -> int:
    import bench
    from adfs_spark.queries import QUERIES
    from adfs_spark.session import get_spark

    bench.SF_DIR = SF_DIR

    cal_start = bench.host_calibration()
    spark = get_spark("sf100-spotcheck-r09")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    cold_log = os.environ.get("SPOTCHECK_COLD_LOG")
    if cold_log:
        # Reuse the cold pass from an interrupted run at the same HEAD:
        # after that run the page cache is warm, so re-running "cold"
        # here would mislabel a warm read.  The log lines are the
        # genuinely cold single-pass measurements.
        with open(cold_log) as f:
            for line in f:
                if line.startswith("cold ") and ": " in line:
                    name, _, t = line[5:].strip().partition(": ")
                    if name in TOUCHED:
                        cold[name] = float(t)
        missing = [n for n in TOUCHED if n not in cold]
        if missing:
            raise SystemExit(f"cold log missing {missing}")
        print(f"cold pass reused from {cold_log}: {cold}", flush=True)
    else:
        for name in TOUCHED:
            fn, _ = QUERIES[name]
            spark.sparkContext.setJobDescription(f"spotcheck cold {name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.time() - t0, 3)
            print(f"cold {name}: {cold[name]}", flush=True)
            spark.catalog.clearCache()
    for _pass in range(2):
        for name in TOUCHED:
            fn, _ = QUERIES[name]
            spark.sparkContext.setJobDescription(f"spotcheck warm {name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t = round(time.time() - t0, 3)
            warm[name] = min(warm.get(name, t), t)
            print(f"warm pass {_pass} {name}: {t}", flush=True)
            # One-shot query callers leave internal persists to LRU
            # eviction; at sf100 three dedup passes accumulate tens of
            # GB of persisted shingle/signature frames and the NEXT
            # query's shuffle OOMs (observed: warm pass-1 q5 heap OOM
            # at driver-mem 8g).  Each measurement must stand alone.
            spark.catalog.clearCache()

    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription("spotcheck writes")
    t0 = time.time()
    writes = bench.bench_writes(spark)
    print("writes done", round(time.time() - t0, 1), json.dumps(writes), flush=True)

    cal_end = bench.host_calibration()

    path = os.path.join(REPO, "BENCH_full_sf100.json")
    with open(path) as f:
        full = json.load(f)

    full.setdefault("queries_warm_r9midbuild", dict(full.get("queries_warm", {})))
    full.setdefault("writes_r9midbuild", dict(full.get("writes", {})))
    for name, t in warm.items():
        full["queries_warm"][name] = t
    full["writes"] = {k: v for k, v in writes.items()}
    full["write_total_sec"] = round(sum(writes.values()), 3)
    full["write_stats"] = dict(bench.WRITE_STATS) or full.get("write_stats", {})
    full["queries_warm_total_sec"] = round(sum(full["queries_warm"].values()), 3)
    full["spotcheck_r9"] = {
        "note": NOTE,
        "touched": TOUCHED,
        "cold_single_pass": cold,
        "cold_provenance": (
            f"reused from interrupted same-HEAD run ({cold_log})"
            if cold_log
            else "this run"
        ),
        "host_load": {"start": cal_start, "end": cal_end},
    }
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps({"warm": warm, "cold": cold, "writes": writes}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
