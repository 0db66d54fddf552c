from __future__ import annotations

from pyspark.sql import functions as F

from adfs_spark.operators.aggregates import (
    cluster_statistics,
    content_summary,
    group_argmax,
    max_version,
    sum_lengths_per_parent,
    under_replicated,
)
from adfs_spark.operators.joins import anti_join, chain_join, fk_join, report_diff, semi_join
from adfs_spark.operators.windows import last_by_ordinal, pick_one_per_group, priority_bucket, top_k


def test_fk_join_counts(tables):
    j = fk_join(tables["lineitem"], tables["orders"], "l_orderkey", "o_orderkey")
    assert j.count() == tables["lineitem"].count()


def test_broadcast_dim_join_plan(tables):
    j = fk_join(tables["customer"], tables["nation"], "c_nationkey", "n_nationkey", broadcast_parent=True)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert j.count() == tables["customer"].count()


def test_semi_anti_partition(tables):
    ev, orders = tables["events"], tables["orders"]
    on = ev["event_id"] == orders["o_orderkey"]
    n_semi = semi_join(ev, orders, on).count()
    n_anti = anti_join(ev, orders, on).count()
    assert n_semi + n_anti == ev.count()


def test_report_diff(spark):
    stored = spark.createDataFrame([(1,), (2,), (3,)], "id: long")
    reported = spark.createDataFrame([(2,), (3,), (4,)], "id: long")
    add, rm, match = report_diff(reported, stored, ["id"])
    assert [r["id"] for r in add.collect()] == [4]
    assert [r["id"] for r in rm.collect()] == [1]
    assert match.count() == 2


def test_chain_join(tables):
    j = chain_join(
        [tables["region"], tables["nation"], tables["customer"]],
        [("n_regionkey", "r_regionkey"), ("c_nationkey", "n_nationkey")],
    )
    assert j.count() == tables["customer"].count()


def test_group_argmax_primary_replica(tables):
    li = tables["lineitem"]
    got = group_argmax(li, ["l_orderkey"], ["l_shipdate", "l_linenumber"])
    assert got.count() == li.select("l_orderkey").distinct().count()
    one = got.filter(F.col("l_orderkey") == 1).collect()[0]
    expect = (
        li.filter(F.col("l_orderkey") == 1)
        .orderBy(F.desc("l_shipdate"), F.desc("l_linenumber"))
        .first()
    )
    assert one["l_linenumber"] == expect["l_linenumber"]


def test_group_argmax_packed_equals_general(tables, spark):
    from adfs_spark.operators.aggregates import group_argmax_packed

    li = tables["lineitem"]
    packed = group_argmax_packed(li, ["l_orderkey"], "l_shipdate", "l_linenumber")
    general = group_argmax(
        li,
        ["l_orderkey"],
        ["l_shipdate", "l_linenumber"],
        payload_cols=["l_orderkey", "l_shipdate", "l_linenumber"],
    )
    cols = ["l_orderkey", "l_shipdate", "l_linenumber"]
    assert sorted(map(tuple, packed.select(*cols).collect())) == sorted(
        map(tuple, general.select(*cols).collect())
    )


def test_group_argmax_packed_pre_epoch_timestamps(spark):
    """Negative epoch seconds must order and decode exactly (arithmetic
    shift + pmod, never float division)."""
    from adfs_spark.operators.aggregates import group_argmax_packed

    df = spark.createDataFrame(
        [
            (1, "1961-04-12 00:00:00", 3),
            (1, "1961-04-12 00:00:00", 5),
            (1, "1969-12-31 23:59:59", 0),
            (2, "1955-11-05 06:00:00", 7),
            (2, "1955-11-05 06:00:01", 1),
        ],
        "k int, ts string, i int",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "i")
    got = {
        (r["k"]): (str(r["ts"]), r["i"])
        for r in group_argmax_packed(df, ["k"], "ts", "i").collect()
    }
    assert got[1] == ("1969-12-31 23:59:59", 0)
    assert got[2] == ("1955-11-05 06:00:01", 1)


def test_last_by_ordinal(tables):
    got = last_by_ordinal(tables["lineitem"], "l_orderkey", "l_linenumber")
    mx = (
        tables["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.max("l_linenumber").alias("m"))
    )
    j = got.join(mx, "l_orderkey").filter(F.col("l_linenumber") != F.col("m"))
    assert j.count() == 0


def test_sum_per_parent(tables):
    got = sum_lengths_per_parent(tables["lineitem"], "l_orderkey", "l_quantity", min_value=None)
    row = got.filter(F.col("l_orderkey") == 1).first()
    expect = tables["lineitem"].filter(F.col("l_orderkey") == 1).agg(F.sum("l_quantity")).first()[0]
    assert row["sum_l_quantity"] == expect


def test_content_summary(spark):
    ns = spark.createDataFrame(
        [(1, -1), (2, 100), (3, 50), (4, -1)], "id: long, length: long"
    )
    row = content_summary(ns).first()
    assert row["total_length"] == 150 and row["file_count"] == 2 and row["dir_count"] == 2


def test_cluster_statistics(tables):
    got = cluster_statistics(
        tables["supplier"], F.col("s_acctbal") > 0, ["s_acctbal"]
    ).first()
    assert got["alive_count"] == tables["supplier"].filter("s_acctbal > 0").count()


def test_under_replicated(tables):
    counts = under_replicated(
        tables["lineitem"],
        tables["orders"].withColumn("expected", F.lit(3)),
        "l_orderkey",
        "o_orderkey",
        "expected",
    )
    direct = (
        tables["lineitem"].groupBy("l_orderkey").count().filter(F.col("count") < 3).count()
    )
    assert counts.count() == direct


def test_max_version(tables):
    df = tables["orders"].withColumn(
        "version",
        F.when(F.col("o_orderkey") % 7 == 0, -(F.col("o_orderkey") + 1)).otherwise(
            F.col("o_orderkey") + 1
        ),
    )
    assert max_version(df).first()["max_version"] == 1500


def test_priority_bucket_topk(tables):
    b = priority_bucket(
        tables["orders"],
        [
            (F.col("o_orderpriority") == "1-URGENT", 0),
            (F.col("o_orderpriority") == "2-HIGH", 1),
        ],
        default=2,
    )
    got = top_k(b, [F.col("priority"), F.col("o_orderkey")], 10).collect()
    assert all(r["priority"] == 0 for r in got) or len(got) == 10


def test_pick_one_per_group(tables):
    got = pick_one_per_group(
        tables["customer"], "c_nationkey", order_by=[F.col("c_custkey")]
    )
    assert got.count() == tables["customer"].select("c_nationkey").distinct().count()
    first = got.filter(F.col("c_nationkey") == 0).first()
    expect = tables["customer"].filter(F.col("c_nationkey") == 0).agg(F.min("c_custkey")).first()[0]
    assert first["c_custkey"] == expect


def test_asof_join_semantics(spark):
    from adfs_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "early"), (2, 10, "other")],
        "k: long, ts: long, name: string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 10, 200.0), (1, 15, 300.0), (3, 1, 999.0)],
        "k: long, ts: long, px: double",
    )
    got = {
        r["name"]: (r["ts_right"], r["px"])
        for r in asof_join(left, right, on="k", left_ts="ts", how="left").collect()
    }
    assert got["early"] == (None, None)          # nothing at or before ts=5
    assert got["a"] == (10, 200.0)               # tie: right at equal ts visible
    assert got["b"] == (15, 300.0)               # latest of the three
    assert got["other"] == (None, None)          # key never matches

    inner = asof_join(left, right, on="k", left_ts="ts", how="inner")
    assert {r["name"] for r in inner.collect()} == {"a", "b"}
    # collision suffix applied only to clashing names
    assert set(inner.columns) == {"k", "ts", "name", "ts_right", "px"}


def test_asof_join_single_shuffle(spark):
    from adfs_spark.operators.joins import asof_join

    left = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("ts"), F.lit("x").alias("v")
    )
    right = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("ts"), F.lit(1.0).alias("px")
    )
    p = (
        asof_join(left, right, on="k", left_ts="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union + window: exactly one exchange (by key), no join node at all
    assert p.count("Exchange") == 1
    assert "Join" not in p


def test_range_join_semantics(spark):
    from adfs_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 10, "lonely"), (2, 100, "wrongkey")],
        "k: long, ts: long, name: string",
    )
    right = spark.createDataFrame(
        # for left ts=100, delta=50: qualifying window is (50, 100]
        [(1, 100, "eq"), (1, 51, "edge_in"), (1, 50, "edge_out"),
         (1, 101, "future"), (3, 100, "nokey")],
        "k: long, ts: long, tag: string",
    )
    got = range_join(left, right, on="k", left_ts="ts", delta=50)
    pairs = {(r["name"], r["tag"]) for r in got.collect()}
    assert pairs == {("a", "eq"), ("a", "edge_in")}
    # no duplicate pairs from the 2-bucket duplication
    assert got.count() == len(pairs)

    lft = range_join(left, right, on="k", left_ts="ts", delta=50, how="left")
    rows = {(r["name"], r["tag"]) for r in lft.collect()}
    assert ("lonely", None) in rows and ("wrongkey", None) in rows


def test_hll_sketch_accuracy_and_plan(spark):
    df = spark.range(20000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 3777).alias("v")
    )
    got = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("v", rsd=0.02).alias("n"))
        .collect()
    }
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for g in exact:
        assert abs(got[g] - exact[g]) / exact[g] < 0.05
    # single shuffle: sketches merge map-side (no distinct expand)
    p = (
        df.groupBy("g").agg(F.approx_count_distinct("v").alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange") == 1


def test_table_diff_classification(spark):
    from adfs_spark.operators.delta import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "id: long, name: string, v: double",
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0),      # identical → absent from diff
         (2, "b", 20.0),      # NULL → value: changed (null-safe compare)
         (4, "d", 41.0),      # value edit: changed
         (5, "e", 50.0)],     # new key: added
        "id: long, name: string, v: double",
    )
    got = {r["id"]: r["diff"] for r in table_diff(left, right, pk=["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}
    # restricting compared columns ignores other edits
    got2 = {
        r["id"]: r["diff"]
        for r in table_diff(left, right, pk=["id"], compare_cols=["name"]).collect()
    }
    assert got2 == {3: "removed", 5: "added"}


def test_salted_join_matches_plain_join(spark):
    from adfs_spark.operators.joins import salted_join

    # one monster key (90% of rows) + a tail
    skewed = spark.createDataFrame(
        [(1 if i < 900 else i % 37, i) for i in range(1000)], "k: long, payload: long"
    )
    other = spark.createDataFrame([(i, f"d{i}") for i in range(40)], "k: long, attr: string")
    got = salted_join(skewed, other, "k", num_salts=8)
    want = skewed.join(other, "k")
    assert got.columns == want.columns
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # the physical join key is (k, _salt): the monster key spreads
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in p


def test_approx_quantiles_accuracy_and_plan(spark):
    from adfs_spark.queries import QUERIES

    fn, _ = QUERIES["agg_approx_quantiles"]
    exact_fn, _ = QUERIES["agg_exact_quantiles"]
    sf = "/root/testdata/sf0.001"
    got = {r["o_orderstatus"]: r["quartiles_approx"] for r in fn(spark, sf).collect()}
    exact = {r["o_orderstatus"]: r["quartiles"] for r in exact_fn(spark, sf).collect()}
    for g, qs in exact.items():
        for a, e in zip(got[g], qs):
            assert abs(a - e) / max(abs(e), 1.0) < 0.02, (g, a, e)
    # sketches merge map-side: one Exchange, partial aggregation present
    p = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1
    assert "partial_approx_percentile" in p
