#!/usr/bin/env python
"""Phase-level profile of dedup_minhash_lsh at sf100 (guide §1: measure
first).  Mirrors minhash_near_duplicates' auto route (small-corpus
branch: documents.parquet sizeInBytes 0.54 GiB < 1 GiB gate, md5 probe
finds max_family=2 <= 64, guard off) and force-materializes each stage
so the wall-clock split is visible.  The barriers added by the counts
make the TOTAL slightly larger than the honest pipeline; the split is
what we're after.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/profile_dedup_sf100.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf100")


def main() -> int:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from adfs_spark.functions.dedup import (
        _banded,
        _hashed_shingles,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from adfs_spark.session import get_spark

    spark = get_spark("dedup-profile-sf100")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    # warm the page cache for the doc table so phase 1 isn't disk-bound
    spark.sparkContext.setJobDescription("warmup scan")
    df.select(F.sum(F.length("text"))).collect()

    t = {}

    def mark(name, t0):
        t[name] = round(time.time() - t0, 2)
        print(f"{name}: {t[name]}", flush=True)

    spark.sparkContext.setJobDescription("p0 md5 probe")
    t0 = time.time()
    fp0 = df.select(F.col("doc_id").alias("_mid"), F.md5("text").alias("_fp")).persist()
    mf = (
        fp0.groupBy("_fp").agg(F.count("*").alias("g")).agg(F.max("g")).first()[0]
    )
    mark("p0_md5_probe", t0)
    fp0.unpersist()
    print("max_family:", mf, flush=True)

    spark.sparkContext.setJobDescription("p1 shingle build+persist")
    t0 = time.time()
    sh = (
        _hashed_shingles(df, "doc_id", "text", 3, "string")
        .repartition(F.col("_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_sh = sh.count()
    mark("p1_shingles", t0)
    print("shingle rows:", n_sh, flush=True)

    spark.sparkContext.setJobDescription("p2 signatures+banding+candidates")
    t0 = time.time()
    sigs = minhash_signatures(df, "doc_id", "text", 3, 64, 42, shingle_df=sh)
    cands = lsh_candidate_pairs(sigs, 16, 4).persist()
    n_c = cands.count()
    mark("p2_sigs_cands", t0)
    print("candidate pairs:", n_c, flush=True)

    spark.sparkContext.setJobDescription("p3 verify")
    t0 = time.time()
    out = jaccard_pairs(
        df, "doc_id", "text", 3, 0.8, candidates=cands, shingle_df=sh
    )
    out.write.format("noop").mode("overwrite").save()
    mark("p3_verify", t0)

    print("TOTAL:", round(sum(t.values()), 2), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
