from __future__ import annotations

from pyspark.sql import functions as F

from adfs_spark.functions.audit import fk_orphans, pk_duplicates, profile_columns


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
        "id: long, s: string, v: double",
    )
    prof = {r["col_name"]: r for r in profile_columns(df, ["id", "s", "v"]).collect()}
    assert prof["id"]["n_nonnull"] == 3
    assert prof["id"]["n_null"] == 0
    assert prof["id"]["n_distinct"] == 2
    assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 2.0
    assert prof["id"]["min_str"] is None
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_nonnull"] == 2
    assert prof["v"]["min_num"] == 1.5 and prof["v"]["max_num"] == 3.5


def test_profile_approx_distinct(spark):
    df = spark.range(1000).withColumn("k", F.col("id") % 100)
    r = {r["col_name"]: r for r in profile_columns(df, ["k"], approx_distinct=True).collect()}
    assert abs(r["k"]["n_distinct"] - 100) <= 5


def test_pk_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w"), (3, "v"), (3, "u")],
        "id: long, val: string",
    )
    got = {(r["id"], r["n_dup"]) for r in pk_duplicates(df, ["id"]).collect()}
    assert got == {(1, 2), (3, 3)}


def test_fk_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (98,)], "fk: long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: long")
    got = {
        (r["fk"], r["n_rows"])
        for r in fk_orphans(child, parent, ["fk"], ["pk"], broadcast_parent=True).collect()
    }
    assert got == {(99, 2), (98, 1)}


def test_heavy_hitters_exact_and_sketch(spark):
    rows = [(v,) for v in ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5]
    df = spark.createDataFrame(rows, "k: string")
    exact = [(r["item"], r["n"]) for r in __import__("adfs_spark.functions.audit", fromlist=["heavy_hitters"]).heavy_hitters(df, "k", k=3).collect()]
    assert exact == [("a", 50), ("b", 30), ("c", 15)]
    sk = {r["item"]: r["n"] for r in __import__("adfs_spark.functions.audit", fromlist=["heavy_hitters"]).heavy_hitters(df, "k", k=3, sketch=True).collect()}
    # sketch tier must find the same heads with exact counts at this scale
    assert sk == {"a": 50, "b": 30, "c": 15}


def test_shuffle_order_is_deterministic_permutation(spark):
    from adfs_spark.functions.sampling import shuffle_order

    df = spark.range(500).withColumnRenamed("id", "k")
    a = shuffle_order(df, "k")
    orders = [r["train_order"] for r in a.collect()]
    assert sorted(orders) == list(range(1, 501))  # dense 1..n permutation
    b = {r["k"]: r["train_order"] for r in shuffle_order(df, "k").collect()}
    am = {r["k"]: r["train_order"] for r in a.collect()}
    assert am == b  # re-run identical
    c = {r["k"]: r["train_order"] for r in shuffle_order(df, "k", seed="epoch1").collect()}
    assert c != am  # new epoch → new permutation
    assert sorted(c.values()) == list(range(1, 501))


def test_shuffle_order_plan_has_no_global_funnel(spark):
    from adfs_spark.functions.sampling import shuffle_order

    df = spark.range(1000).withColumnRenamed("id", "k")
    plan = shuffle_order(df, "k")._jdf.queryExecution().executedPlan().toString()
    # the rank window partitions by bucket — never a single-partition sort
    assert "SinglePartition" not in plan


def test_funnel_counts(spark):
    from adfs_spark.functions.events import funnel_counts

    rows = [
        # u1 completes signup->view->click in order
        (1, "signup", "2026-01-01 00:00:00"),
        (1, "view", "2026-01-01 01:00:00"),
        (1, "click", "2026-01-01 02:00:00"),
        # u2 views BEFORE signup: must not count past step 0
        (2, "view", "2026-01-01 00:00:00"),
        (2, "signup", "2026-01-01 01:00:00"),
        # u3 signup only
        (3, "signup", "2026-01-01 00:00:00"),
    ]
    from pyspark.sql import functions as F

    e = spark.createDataFrame(rows, "user_id: long, event_type: string, ts_s: string") \
        .withColumn("ts", F.to_timestamp("ts_s"))
    got = {r["step"]: r["n_users"] for r in funnel_counts(e, ["signup", "view", "click"]).collect()}
    assert got == {"signup": 3, "view": 1, "click": 1}


def test_retention_cohorts(spark):
    from pyspark.sql import functions as F

    from adfs_spark.functions.events import retention_cohorts

    rows = [
        (1, "2026-01-05 00:00:00"),  # Monday — cohort week 2026-01-05
        (1, "2026-01-14 00:00:00"),  # 9 days later → offset 1
        (2, "2026-01-06 00:00:00"),  # same cohort week
    ]
    e = spark.createDataFrame(rows, "user_id: long, ts_s: string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in retention_cohorts(e).collect()
    }
    assert got == {("2026-01-05", 0): 2, ("2026-01-05", 1): 1}


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from adfs_spark.functions.graph import pagerank

    # small directed graph with a dangling node (3) and a hub (0)
    edges = [(1, 0), (2, 0), (2, 1), (0, 3), (1, 3)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=20).collect()}

    # numpy reference: same un-normalized convention, dangling → uniform
    n = 4
    out = {0: [3], 1: [0, 3], 2: [0, 1], 3: []}
    r = np.ones(n)
    d = 0.85
    for _ in range(20):
        nxt = np.zeros(n)
        dangling = sum(r[u] for u in range(n) if not out[u])
        for u in range(n):
            for v in out[u]:
                nxt[v] += d * r[u] / len(out[u])
        nxt += (1 - d) + d * dangling / n
        r = nxt
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9
    # conservation: total rank mass == node count
    assert abs(sum(got.values()) - n) < 1e-9


def test_temperature_weights_and_mix(spark):
    from pyspark.sql import functions as F

    from adfs_spark.functions.sampling import temperature_weights, weighted_mix

    counts = {"big": 8000, "mid": 1500, "small": 500}
    # T=1: proportional sampling at half budget → every rate 0.5
    w1 = temperature_weights(counts, temperature=1.0, budget_fraction=0.5)
    assert all(abs(v - 0.5) < 1e-9 for v in w1.values())
    # high T flattens: small sources upweighted relative to big ones
    w2 = temperature_weights(counts, temperature=3.0, budget_fraction=0.5)
    assert w2["small"] > w1["small"] and w2["big"] < w1["big"]
    # realized budget ≈ requested
    kept = sum(w2[k] * counts[k] for k in counts)
    assert abs(kept - 0.5 * sum(counts.values())) < 1.0
    # waterfilling: tiny source caps at 1.0, budget still honored
    w3 = temperature_weights({"a": 10, "b": 10000}, temperature=5.0, budget_fraction=0.5)
    assert w3["a"] == 1.0
    assert abs(w3["a"] * 10 + w3["b"] * 10000 - 0.5 * 10010) < 1.0

    # end-to-end through weighted_mix on a real frame
    rows = [(i, "big" if i < 800 else ("mid" if i < 950 else "small")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    cts = {r["source"]: r["n"] for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}
    rates = temperature_weights(cts, temperature=2.0, budget_fraction=0.4)
    kept_df = weighted_mix(df, rates, "source", "doc_id")
    n_kept = kept_df.count()
    assert abs(n_kept - 400) < 60  # hash-bucket realization noise


def test_profile_columns_decimal_is_numeric(spark):
    df = spark.createDataFrame([(1,), (2,)], "id: long").select(
        F.col("id").cast("decimal(10,2)").alias("d")
    )
    prof = {r["col_name"]: r for r in profile_columns(df, ["d"]).collect()}
    assert prof["d"]["min_num"] == 1.0 and prof["d"]["max_num"] == 2.0
    assert prof["d"]["min_str"] is None


def test_temperature_weights_validates_inputs():
    import pytest

    from adfs_spark.functions.sampling import temperature_weights

    with pytest.raises(ValueError):
        temperature_weights({"a": 10}, temperature=0.0)
    # all-zero counts: no probability mass, every rate 0, no crash
    assert temperature_weights({"a": 0, "b": 0}, temperature=2.0) == {
        "a": 0.0,
        "b": 0.0,
    }


def test_shuffle_order_empty_input(spark):
    from adfs_spark.functions.sampling import shuffle_order

    df = spark.createDataFrame([], "k: string")
    out = shuffle_order(df, "k")
    assert out.count() == 0
    assert "train_order" in out.columns
