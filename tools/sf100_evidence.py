#!/usr/bin/env python
"""Targeted sf100 evidence refresh (round 7).

Re-measures exactly the rows the r6 verdict called out, on HEAD, and
patches them into BENCH_sf100.json with a provenance note — the full
sf100 bench is a multi-hour run, and these are the fields whose old
values argue against operators that have since been fixed:

1. canonical_stats — the keep-step rung at 2M vectors, previously
   SKIPPED (all-pairs graph fixture-quadratic): now RUN in spanning
   mode (greedy-leader verified star, 2 LSH tables) with planted
   family recall.
2. semdedup_stats.planted — previously recall 0.8496 with the
   soft-boundary probe off; now the auto-eps ladder (probe on when
   and only when the gate fails, pair work recorded).
3. incremental_phases — the 252 s dedup_minhash_incremental row's
   per-phase split (r6 ask #5).
4. namespace_ops.sync2_group — group-commit ops/s vs k next to the
   serial sync2 floor (r6 ask #4).

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


def main() -> int:
    import bench
    from adfs_spark.session import get_spark

    bench.SF_DIR = SF_DIR
    spark = get_spark("sf100-evidence")
    spark.sparkContext.setLogLevel("ERROR")

    patch: dict = {}

    # 1. canonical keep-step (spanning RUNS at this rung now)
    out: dict = {}
    t0 = time.time()
    bench._canonical_keep_step(spark, out)
    patch["canonical_stats"] = dict(bench.CANONICAL_STATS)
    patch["canonical_stats"]["refreshed"] = "r7 targeted run on HEAD"
    print("canonical done", round(time.time() - t0, 1), flush=True)

    # 2. SemDeDup planted recall with the auto-eps ladder
    from adfs_spark.catalog import load_table
    from adfs_spark.functions.similarity import semdedup_planted_recall

    t0 = time.time()
    planted = semdedup_planted_recall(
        load_table(spark, SF_DIR, "embeddings"),
        n_clusters="auto",
        kmeans_iters=3,
        boundary_eps="auto",
    )
    planted["refreshed"] = "r7 targeted run on HEAD"
    patch["semdedup_planted"] = planted
    print("planted done", round(time.time() - t0, 1), flush=True)

    # 3. incremental-dedup phase split (+ the standing split rows)
    t0 = time.time()
    incr = bench.bench_incremental_split(spark)
    patch["incremental_split"] = incr
    patch["incremental_phases"] = dict(bench.INCR_PHASES)
    patch["incremental_phases"]["refreshed"] = "r7 targeted run on HEAD"
    print("incremental done", round(time.time() - t0, 1), flush=True)

    # 4. namespace ops incl. sync2 group commit
    t0 = time.time()
    ns = bench.bench_namespace_ops(spark)
    patch["namespace_ops"] = ns
    print("namespace done", round(time.time() - t0, 1), flush=True)

    # patch into BENCH_sf100.json (full side file stays the r6 run for
    # every field not re-measured here; provenance notes mark the rest)
    path = os.path.join(REPO, "BENCH_sf100.json")
    with open(path) as f:
        doc = json.load(f)
    doc["canonical_stats"] = patch["canonical_stats"]
    doc.setdefault("semdedup_stats", {})["planted"] = patch["semdedup_planted"]
    doc["incremental_phases"] = patch["incremental_phases"]
    for k, v in patch["incremental_split"].items():
        doc.setdefault("extra_queries", {})[k] = v
    old_ns = doc.get("namespace_ops", {})
    old_ns.update(patch["namespace_ops"])
    doc["namespace_ops"] = old_ns
    doc["refresh_note"] = (
        "canonical_stats / semdedup planted / incremental phases+split / "
        "namespace_ops re-measured on round-7 HEAD (tools/sf100_evidence.py); "
        "headline queries + writes are the r6 full run"
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    with open(os.path.join(REPO, "BENCH_full_sf100.json")) as f:
        full = json.load(f)
    full["canonical_stats"] = doc["canonical_stats"]
    full.setdefault("semdedup_stats", {})["planted"] = patch["semdedup_planted"]
    full["incremental_phases"] = doc["incremental_phases"]
    full["namespace_ops"] = doc["namespace_ops"]
    full["refresh_note"] = doc["refresh_note"]
    with open(os.path.join(REPO, "BENCH_full_sf100.json"), "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps({k: patch[k] for k in ("canonical_stats", "semdedup_planted")}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
