"""Mergeable sketches (functions/sketches.py): Bloom build/probe and
HLL distinct/rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from adfs_spark.functions.sketches import (
    bloom_build,
    bloom_contamination_candidates,
    bloom_might_contain,
    bloom_parameters,
    hll_distinct,
    hll_sketch_rollup,
)


def test_bloom_no_false_negatives_and_fp_bound(spark):
    keys = [f"key_{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k: string")
    m, kh = bloom_parameters(len(keys), fp_rate=0.01)
    bitmap = bloom_build(df, "k", m, kh)
    assert len(bitmap) == m // 64

    # every inserted key probes true — the hard guarantee
    probe_in = df.select(bloom_might_contain(bitmap, F.col("k"), kh).alias("m"))
    assert all(r["m"] for r in probe_in.collect())

    # false-positive rate on 2000 absent keys stays near the target
    absent = spark.createDataFrame(
        [(f"other_{i}",) for i in range(2000)], "k: string"
    )
    fp = (
        absent.select(bloom_might_contain(bitmap, F.col("k"), kh).alias("m"))
        .filter("m")
        .count()
    )
    assert fp / 2000 < 0.05  # target 0.01, generous ceiling


def test_bloom_contamination_superset_of_exact(spark):
    from adfs_spark.functions.dedup import contamination_hits

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma something else entirely"),
            (4, "totally unrelated words in this row"),
        ],
        "doc_id: long, text: string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "five six seven eight")],
        "doc_id: long, text: string",
    )
    exact = {
        r["doc_id"]
        for r in contamination_hits(docs, ev).filter("n_hits > 0").collect()
    }
    maybe = {
        r["doc_id"]
        for r in bloom_contamination_candidates(docs, ev).collect()
    }
    assert exact, "fixture must plant real overlap"
    assert exact <= maybe  # no false negatives, ever


def test_hll_distinct_accuracy_and_rollup_merge(spark):
    rows = [(d % 7, f"u{i % 400}", d) for d in range(14) for i in range(300)]
    df = spark.createDataFrame(rows, "grp: int, user: string, day: int")
    exact = {
        (r["grp"],): r["n"]
        for r in df.groupBy("grp").agg(F.countDistinct("user").alias("n")).collect()
    }
    approx = {
        (r["grp"],): r["approx_distinct"]
        for r in hll_distinct(df, ["grp"], "user").collect()
    }
    for g, n in exact.items():
        assert abs(approx[g] - n) / n < 0.05

    # sketch-union rollup (per-day sketches merged) ~= direct estimate
    rolled = {
        (r["grp"],): r["approx_distinct"]
        for r in hll_sketch_rollup(df, ["day"], ["grp"], "user").collect()
    }
    for g, n in exact.items():
        assert abs(rolled[g] - n) / n < 0.05
