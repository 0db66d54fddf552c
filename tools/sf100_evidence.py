#!/usr/bin/env python
"""Targeted sf100 evidence refresh (round 8).

Re-measures exactly the rows this round's changes (and the r7 verdict's
asks) touch, on HEAD, and patches them into BENCH_sf100.json /
BENCH_full_sf100.json with a provenance note — the full sf100 bench is
a multi-hour run, and these are the fields whose old values argue
against operators that have since changed:

1. write_stats.mor_amortized — the mixed-workload MOR-vs-CoW A/B at
   the ONE rung it was missing (r7 ask #2: sf100's w_mor_fold 41.7 s >
   merge 32.8 s motivated the amortization claim; record net_win or a
   retuned overlay_fold_factor here).
2. namespace_ops — sync2 serial floor + sync2_group through the NEW
   bucket-pruned group_point_update path (r7 ask #4: the old per-op
   scans floored sf100 at 19 ops/s; target >= 26 or a recorded floor).
3. incremental_split — now includes the string-vs-tokenhash shingle
   A/B rows (r7 ask #7, measured at the rung where shingling is 85%
   of the batch cost).
4. canonical_stats — the keep-step rung with the equal-input planted
   protocol (r7 ask #6: planted families now seeded into BOTH rungs;
   at sf100 all_pairs records its skip reason, spanning runs).

Usage: SPARK_GRAFT_SF_DIR=/root/repo/fixtures/sf100 python
tools/sf100_evidence.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf100")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTE = "r8 targeted run on HEAD"


def main() -> int:
    import bench
    from adfs_spark.session import get_spark

    bench.SF_DIR = SF_DIR
    spark = get_spark("sf100-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    cal_start = bench.host_calibration()
    patch: dict = {}

    # 1. mor_amortized at sf100 (r7 ask #2)
    t0 = time.time()
    mor = bench.bench_mor_amortized(spark)
    mor["refreshed"] = NOTE
    patch["mor_amortized"] = mor
    print("mor_amortized done", round(time.time() - t0, 1), flush=True)

    # 2. namespace ops incl. the pruned sync2 group commit (r7 ask #4)
    t0 = time.time()
    ns = bench.bench_namespace_ops(spark)
    patch["namespace_ops"] = ns
    print("namespace done", round(time.time() - t0, 1), flush=True)

    # 3. incremental split incl. the shingle-form A/B (r7 ask #7)
    t0 = time.time()
    incr = bench.bench_incremental_split(spark)
    patch["incremental_split"] = incr
    patch["incremental_phases"] = dict(bench.INCR_PHASES)
    patch["incremental_phases"]["refreshed"] = NOTE
    print("incremental done", round(time.time() - t0, 1), flush=True)

    # 4. canonical keep-step, equal-input planted protocol (r7 ask #6)
    out: dict = {}
    t0 = time.time()
    bench._canonical_keep_step(spark, out)
    patch["canonical_stats"] = dict(bench.CANONICAL_STATS)
    patch["canonical_stats"]["refreshed"] = NOTE
    print("canonical done", round(time.time() - t0, 1), flush=True)

    cal_end = bench.host_calibration()

    for path in ("BENCH_sf100.json", "BENCH_full_sf100.json"):
        p = os.path.join(REPO, path)
        with open(p) as f:
            doc = json.load(f)
        doc.setdefault("write_stats", {})["mor_amortized"] = patch["mor_amortized"]
        old_ns = doc.get("namespace_ops") or {}
        old_ns.update(patch["namespace_ops"])
        doc["namespace_ops"] = old_ns
        for k, v in patch["incremental_split"].items():
            doc.setdefault("extra_queries", {})[k] = v
        doc["incremental_phases"] = patch["incremental_phases"]
        doc["canonical_stats"] = patch["canonical_stats"]
        doc["host_load_r8_refresh"] = {"start": cal_start, "end": cal_end}
        doc["refresh_note"] = (
            "mor_amortized / namespace_ops (group_point_update sync2_group) / "
            "incremental split+phases (shingle A/B) / canonical_stats "
            "re-measured on round-8 HEAD (tools/sf100_evidence.py); headline "
            "queries + writes are the r6 full run, other evidence rows r7"
        )
        with open(p, "w") as f:
            json.dump(doc, f, indent=1)
    summary = {
        "mor_amortized": {
            k: patch["mor_amortized"][k] for k in ("net_win",)
        },
        "sync2_group": patch["namespace_ops"].get("sync2_group"),
        "shingle_ab": {
            k: v
            for k, v in patch["incremental_split"].items()
            if "tokenhash" in k or "batch" in k or "build" in k
        },
        "spanning": patch["canonical_stats"].get("spanning"),
    }
    print(json.dumps(summary, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
