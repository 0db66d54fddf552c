#!/usr/bin/env python
"""A/B the restructured dedup pipeline at sf100: signatures aggregated
inline off the doc scan (map-side partial agg fused with the shingle
explode — no repartition, no full-corpus shingle persist), verify
re-shingling only candidate members (doc-level semi-join before the
explode, the incremental path's shape).  Result-identical by
construction: same shingle hashes, same signatures, same candidates,
same exact-Jaccard verify.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/profile_dedup_sf100_v2.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf100")


def main() -> int:
    from pyspark.sql import functions as F

    from adfs_spark.functions.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from adfs_spark.session import get_spark

    spark = get_spark("dedup-profile-sf100-v2")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    spark.sparkContext.setJobDescription("warmup scan")
    df.select(F.sum(F.length("text"))).collect()

    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 2)
        print(f"{name}: {t[name]}", flush=True)

    spark.sparkContext.setJobDescription("p0 md5 probe")
    t0 = time.time()
    fp0 = df.select(F.col("doc_id").alias("_mid"), F.md5("text").alias("_fp")).persist()
    mf = fp0.groupBy("_fp").agg(F.count("*").alias("g")).agg(F.max("g")).first()[0]
    mark("p0_md5_probe", t0)
    fp0.unpersist()
    print("max_family:", mf, flush=True)

    # signatures inline: explode + partial agg fused, exchange carries
    # ~5M partial rows of 64 longs instead of 260M shingle rows
    spark.sparkContext.setJobDescription("p1 signatures inline + candidates")
    t0 = time.time()
    sigs = minhash_signatures(df, "doc_id", "text", 3, 64, 42)
    cands = lsh_candidate_pairs(sigs, 16, 4).persist()
    n_c = cands.count()
    mark("p1_sigs_cands_inline", t0)
    print("candidate pairs:", n_c, flush=True)

    # verify: re-shingle ONLY candidate members (doc-level semi-join
    # BEFORE the explode)
    spark.sparkContext.setJobDescription("p2 verify via candidate re-shingle")
    t0 = time.time()
    needed = (
        cands.select(F.col("id_a").alias("doc_id"))
        .union(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    docs_needed = df.select("doc_id", "text").join(needed, "doc_id", "left_semi")
    out = jaccard_pairs(
        docs_needed, "doc_id", "text", 3, 0.8, candidates=cands
    )
    out.write.format("noop").mode("overwrite").save()
    mark("p2_verify_reshingle", t0)

    print("TOTAL:", round(sum(t.values()), 2), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
