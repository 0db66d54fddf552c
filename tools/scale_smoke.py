#!/usr/bin/env python
"""10× scale smoke + scaling-regression GATE: replicate the sf0.1
fixtures to ~sf1 with shifted keys, run the heavy headline queries at
both scales, and FAIL (exit 1) if any query's scaling ratio exceeds the
gate — a plan whose cost curve bends super-linear inside one decade is
a regression even when every correctness test stays green.

Also machine-records the MinHash-LSH banding evidence at BOTH scales
(max bucket size, Σ pair-work, candidates/doc — the SCALE.md §11
numbers that were previously measured ad hoc) and asserts
candidates_per_doc < 1 at every SF: the banding must stay
candidate-sparse as data grows or the verify stage goes quadratic.

Usage: python tools/scale_smoke.py  (writes the scaled copy to a temp
dir; ~1 GB of disk, a few minutes of compute).  Prints one JSON line;
pytest runs a small-copies variant via tests/test_scale_gate.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
# Gate: data grows COPIES x; scan-bound plans should track that and
# candidate-driven ones undercut it.  A ratio past ~1.2x the growth
# (default 12 at 10 copies) means something super-linear crept in.
RATIO_GATE = float(os.environ.get("SPARK_GRAFT_SCALE_GATE", str(COPIES * 1.2)))
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


def scale_tables(spark, dest: str, copies: int = COPIES, sf_dir: str = SF_DIR) -> None:
    from pyspark.sql import functions as F

    from adfs_spark.catalog import load_table

    tables = sorted({t for ts in QUERIES_TABLES.values() for t in ts})
    for name in tables:
        base = load_table(spark, sf_dir, name)
        parts = []
        for i in range(copies):
            df = base
            for k in KEY_COLS[name]:
                df = df.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE))
            if name == "documents" and i > 0:
                # distinct content per copy — and not NEAR-dup distinct:
                # a suffix marker leaves copies ~99% shingle-identical,
                # which manufactures copies^2 cross-copy near-dup pairs
                # and pollutes the candidates/doc evidence.  Rotating a
                # few frequent letters per copy changes shingles
                # everywhere while preserving token structure, so the
                # dedup/text work really grows copies x with the true
                # intra-copy dup density.
                alpha = "aeioustn"
                rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
                df = df.withColumn("text", F.translate(F.col("text"), alpha, rot))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(dest, f"{name}.parquet")
        )


def lsh_stats(spark, sf_dir: str) -> dict:
    from adfs_spark.catalog import load_table
    from adfs_spark.functions.dedup import minhash_lsh_stats

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_stats(docs, "doc_id", "text")


def run_gate(
    spark, sf_dir: str = SF_DIR, copies: int = COPIES,
    ratio_gate: float | None = None, passes: int = 2, keep_dest: bool = False,
) -> dict:
    """Run the smoke at (sf_dir, sf_dir x copies); returns the result
    dict with per-query ratios, LSH stats at both scales, and the list
    of gate violations (empty = pass)."""
    from adfs_spark.queries import QUERIES

    gate = ratio_gate if ratio_gate is not None else copies * 1.2
    dest = tempfile.mkdtemp(prefix="scale_smoke_")
    try:
        scale_tables(spark, dest, copies, sf_dir)

        def run(name: str, d: str) -> float:
            fn, _ = QUERIES[name]
            best = float("inf")
            for _ in range(passes):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            return best

        queries, violations = {}, []
        for name in QUERIES_TABLES:
            t_small = run(name, sf_dir)
            t_big = run(name, dest)
            ratio = round(t_big / max(t_small, 1e-9), 2)
            queries[name] = {
                "small_sec": round(t_small, 3),
                "big_sec": round(t_big, 3),
                "ratio": ratio,
            }
            if ratio > gate:
                violations.append(f"{name}: ratio {ratio} > gate {gate}")
        stats_small = lsh_stats(spark, sf_dir)
        stats_big = lsh_stats(spark, dest)
        for label, st in (("small", stats_small), ("big", stats_big)):
            if st["candidates_per_doc"] >= 1.0:
                violations.append(
                    f"lsh[{label}]: candidates_per_doc "
                    f"{st['candidates_per_doc']} >= 1 (banding degraded)"
                )
        return {
            "copies": copies,
            "ratio_gate": gate,
            "queries": queries,
            "lsh_stats": {"small": stats_small, "big": stats_big},
            "violations": violations,
        }
    finally:
        if not keep_dest:
            shutil.rmtree(dest, ignore_errors=True)


def main() -> int:
    from adfs_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    result = run_gate(spark, SF_DIR, COPIES, RATIO_GATE)
    print(json.dumps(result))
    spark.stop()
    if result["violations"]:
        for v in result["violations"]:
            print(f"GATE FAIL: {v}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
