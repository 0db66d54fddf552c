#!/usr/bin/env python
"""Micro A/Bs for the dedup hot stage at sf100:

  m1. shingle map-only cost, string form (current)        -> noop
  m2. shingle map-only cost, tokenhash form               -> noop
  m3. signatures inline off the scan, pmod (current)      -> noop
  m4. signatures inline off the scan, Mersenne fold-mod   -> noop
      (provably identical to pmod for non-negative x, P = 2^31-1)

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/profile_dedup_sf100_micro.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/fixtures/sf100")
P = (1 << 31) - 1


def main() -> int:
    from pyspark.sql import functions as F

    from adfs_spark.functions.dedup import (
        _hash_params,
        _hashed_shingles,
    )
    from adfs_spark.session import get_spark

    spark = get_spark("dedup-micro-sf100")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    spark.sparkContext.setJobDescription("warmup scan")
    df.select(F.sum(F.length("text"))).collect()

    def run(name, frame):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        frame.write.format("noop").mode("overwrite").save()
        print(f"{name}: {round(time.time() - t0, 2)}", flush=True)
        spark.catalog.clearCache()

    run("m1_shingles_string", _hashed_shingles(df, "doc_id", "text", 3, "string"))
    run("m2_shingles_tokenhash", _hashed_shingles(df, "doc_id", "text", 3, "tokenhash"))

    params = _hash_params(64, 42)

    def sigs(mod):
        ex = _hashed_shingles(df, "doc_id", "text", 3, "string").withColumn(
            "_hm", F.pmod(F.col("_h"), F.lit(P))
        )
        aggs = [
            F.min(mod(F.col("_hm") * F.lit(a) + F.lit(b))).alias(f"_m{i}")
            for i, (a, b) in enumerate(params)
        ]
        per_doc = ex.groupBy("_id").agg(*aggs)
        return per_doc.select(
            "_id", F.array(*[F.col(f"_m{i}") for i in range(64)]).alias("signature")
        )

    def pm(x):
        return F.pmod(x, F.lit(P))

    def fold(x):
        y1 = F.shiftright(x, 31) + x.bitwiseAND(F.lit(P))
        y2 = F.shiftright(y1, 31) + y1.bitwiseAND(F.lit(P))
        return F.when(y2 >= P, y2 - P).otherwise(y2)

    run("m3_sigs_pmod", sigs(pm))
    run("m4_sigs_foldmod", sigs(fold))

    # sanity: identical signatures on a sample
    a = sigs(pm).orderBy("_id").limit(2000).collect()
    b = sigs(fold).orderBy("_id").limit(2000).collect()
    same = all(
        ra["_id"] == rb["_id"] and ra["signature"] == rb["signature"]
        for ra, rb in zip(a, b)
    )
    print("foldmod identical on 2000-doc sample:", same, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
