#!/usr/bin/env python
"""Isolated sf0.1 profile of dedup_minhash_lsh: best-of-5 noop-sink
passes with clearCache between passes, plus a phase split of one pass
(probe / shingle persist / candidates / verify) — investigating the
1.97 s (§3 after) vs 2.37 s (final artifact) spread."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from adfs_spark.session import get_spark  # noqa: E402
from adfs_spark.catalog import load_table  # noqa: E402
from adfs_spark import queries  # noqa: E402

spark = get_spark("profile-dedup-sf01")
sc = spark.sparkContext


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# warm the scan path once
load_table(spark, SF_DIR, "documents").count()

times = []
for i in range(5):
    spark.catalog.clearCache()
    sc.setJobDescription(f"dedup pass {i}")
    t0 = time.time()
    noop(queries.QUERIES["dedup_minhash_lsh"][0](spark, SF_DIR))
    times.append(round(time.time() - t0, 3))
print("passes:", times, "best:", min(times))

# phase split on a fresh pass
spark.catalog.clearCache()
import pyspark.sql.functions as F  # noqa: E402
from adfs_spark.functions.dedup import (  # noqa: E402
    _hashed_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
    jaccard_pairs,
)
from pyspark import StorageLevel  # noqa: E402

d = load_table(spark, SF_DIR, "documents")
t0 = time.time()
fp0 = d.select(F.col("doc_id").alias("_mid"), F.md5(F.col("text")).alias("_fp")).persist()
mf = (
    fp0.groupBy("_fp").agg(F.count("*").alias("_gsz")).agg(F.max("_gsz").alias("m")).first()["m"]
)
t1 = time.time()
fp0.unpersist()
sh = (
    _hashed_shingles(d, "doc_id", "text", 3, "string")
    .repartition(F.col("_id"))
    .persist(StorageLevel.MEMORY_AND_DISK)
)
sh.count()
t2 = time.time()
sigs = minhash_signatures(d, "doc_id", "text", 3, 64, 42, shingle_df=sh)
cands = lsh_candidate_pairs(sigs, 16, 4).persist()
cands.count()
t3 = time.time()
noop(
    jaccard_pairs(d, "doc_id", "text", 3, 0.8, candidates=cands, shingle_df=sh).select(
        "id_a", "id_b", F.round("jaccard", 5)
    )
)
t4 = time.time()
print(
    f"phases: probe={t1-t0:.3f} shingle_persist={t2-t1:.3f} "
    f"cands={t3-t2:.3f} verify={t4-t3:.3f} total={t4-t0:.3f} max_family={mf}"
)
spark.stop()
