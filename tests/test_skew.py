"""Skew-aware operators (`operators/skew.py`) ≡ their plain forms.

Every test builds a deliberately skewed frame (one key holding ~half
the rows) and checks the salted / split-union result is EXACTLY the
plain window / join — the operators are pure physical rewrites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from adfs_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """(key, seq, val): key 0 holds 5000 rows, keys 1-500 hold ~10."""
    df = spark.range(0, 10000).select(
        F.when(F.col("id") < 5000, F.lit(0))
        .otherwise((F.col("id") % 500) + 1)
        .alias("key"),
        F.col("id").alias("seq"),
        (F.col("id") * 37 % 1013).alias("val"),
    )
    return df.repartition(8).cache()


def _plain_topk(df, k):
    w = Window.partitionBy("key").orderBy(F.desc("val"), "seq")
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@pytest.mark.parametrize("k,salt", [(1, 4), (3, 8), (10, 32)])
def test_salted_topk_equals_plain_window(skewed, k, salt):
    got = skew.salted_topk(
        skewed, ["key"], [F.desc("val"), "seq"], k=k, salt=salt
    )
    exp = _plain_topk(skewed, k)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_salted_topk_k_larger_than_group(skewed):
    """Groups smaller than k keep every row, ranked."""
    got = skew.salted_topk(skewed, ["key"], [F.desc("val"), "seq"], k=50, salt=8)
    exp = _plain_topk(skewed, 50)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_salted_argmax_equals_plain(skewed):
    got = skew.salted_argmax(skewed, ["key"], [F.desc("val"), "seq"], salt=8)
    exp = _plain_topk(skewed, 1).drop("rank")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_heavy_hitter_keys_finds_the_hot_key(skewed):
    hot = skew.heavy_hitter_keys(skewed, ["key"], min_frac=0.1, sample_frac=0.5)
    keys = {r["key"] for r in hot.collect()}
    assert 0 in keys
    assert len(keys) <= 10  # bounded by 1/min_frac


@pytest.mark.parametrize("how", ["inner", "left"])
def test_skew_split_join_equals_plain_join(spark, skewed, how):
    right = spark.range(0, 400).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("rv")
    )
    got = skew.skew_split_join(skewed, right, ["key"], how=how, min_frac=0.1)
    exp = skewed.join(right, ["key"], how)
    assert sorted(
        map(tuple, got.select("key", "seq", "val", "rv").collect())
    ) == sorted(map(tuple, exp.select("key", "seq", "val", "rv").collect()))


def test_skew_split_join_explicit_heavy_and_dup_right(spark, skewed):
    """Right side with per-key fan-out (1→N) through the hot path."""
    right = spark.createDataFrame(
        [(0, "a"), (0, "b"), (7, "x")], "key long, tag string"
    )
    heavy = spark.createDataFrame([(0,)], "key long")
    got = skew.skew_split_join(skewed, right, ["key"], heavy=heavy)
    exp = skewed.join(right, ["key"], "inner")
    assert got.count() == exp.count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_skew_split_join_rejects_unsupported_how(spark, skewed):
    right = spark.range(3).select(F.col("id").alias("key"))
    with pytest.raises(ValueError):
        skew.skew_split_join(skewed, right, ["key"], how="full")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_replicated_skew_join_equals_plain_join(spark, skewed, how):
    right = spark.range(0, 400).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("rv")
    )
    got = skew.replicated_skew_join(
        skewed, right, ["key"], how=how, min_frac=0.1, salt=8
    )
    exp = skewed.join(right, ["key"], how)
    assert sorted(
        map(tuple, got.select("key", "seq", "val", "rv").collect())
    ) == sorted(map(tuple, exp.select("key", "seq", "val", "rv").collect()))


def test_replicated_skew_join_hot_right_fanout(spark, skewed):
    """The case this tier exists for: the HOT key's right slice has
    fan-out (every left row must meet every right row of the key
    exactly once, across salt sub-partitions)."""
    right = spark.createDataFrame(
        [(0, "a"), (0, "b"), (0, "c"), (7, "x")], "key long, tag string"
    )
    heavy = spark.createDataFrame([(0,)], "key long")
    got = skew.replicated_skew_join(skewed, right, ["key"], heavy=heavy, salt=4)
    exp = skewed.join(right, ["key"], "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_replicated_skew_join_rejects_unsupported_how(spark, skewed):
    right = spark.range(3).select(F.col("id").alias("key"))
    with pytest.raises(ValueError):
        skew.replicated_skew_join(skewed, right, ["key"], how="right")


def test_replicated_skew_join_salts_the_hot_exchange(spark, skewed):
    """The hot half's join key must include the salt column — the plan
    shuffles on (key, salt), never on the bare hot key."""
    right = spark.range(0, 400).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("rv")
    )
    heavy = spark.createDataFrame([(0,)], "key long")
    got = skew.replicated_skew_join(skewed, right, ["key"], heavy=heavy, salt=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_skew_salt" in plan


def test_salted_topk_no_single_partition_exchange(skewed):
    """The phase-1 window must partition on (key, salt): the physical
    plan's first window exchange hashes BOTH columns — the funnel
    breaker the operator exists for."""
    got = skew.salted_topk(skewed, ["key"], [F.desc("val"), "seq"], k=2, salt=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "_skew_salt" in plan


@pytest.mark.parametrize("k", [1, 2, 10])
def test_smallk_topk_equals_plain_window(skewed, k):
    got = skew.smallk_topk(
        skewed, ["key"], [("val", "desc"), ("seq", "asc")], k=k
    )
    exp = _plain_topk(skewed, k).select(*got.columns)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_smallk_topk_null_ordering_matches_window(spark):
    """desc = NULLS LAST, asc = NULLS FIRST — the window defaults the
    struct-sort rewrite must reproduce exactly."""
    rows = [
        (1, None, 5), (1, 10.0, 1), (1, 10.0, 2), (1, 3.0, 3),
        (2, None, 1), (2, None, 2), (3, 7.0, 9),
    ]
    df = spark.createDataFrame(rows, "key: int, val: double, seq: int")
    for spec, order in [
        ([("val", "desc"), ("seq", "asc")], [F.desc("val"), "seq"]),
        ([("val", "asc"), ("seq", "asc")], ["val", "seq"]),
    ]:
        w = Window.partitionBy("key").orderBy(*order)
        exp = (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 2)
        )
        got = skew.smallk_topk(df, ["key"], spec, k=2)
        assert sorted(
            (r["key"], r["seq"], r["rank"]) for r in got.collect()
        ) == sorted((r["key"], r["seq"], r["rank"]) for r in exp.collect())


def test_smallk_topk_rejects_bad_specs(skewed, spark):
    with pytest.raises(ValueError, match="k <="):
        skew.smallk_topk(skewed, ["key"], [("val", "desc")], k=1000)
    with pytest.raises(ValueError, match="asc|desc"):
        skew.smallk_topk(skewed, ["key"], [("val", "down")], k=2)
    sdf = spark.createDataFrame([(1, "a")], "key: int, name: string")
    with pytest.raises(ValueError, match="numeric"):
        skew.smallk_topk(sdf, ["key"], [("name", "desc")], k=2)


def test_smallk_topk_plan_has_no_window(skewed):
    """The small-k form must be a pure hash aggregation: no Window, no
    partition-wide sort of the input."""
    got = skew.smallk_topk(
        skewed, ["key"], [("val", "desc"), ("seq", "asc")], k=2
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan, plan
    assert "Window" not in plan, plan
