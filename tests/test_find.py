from __future__ import annotations

from pyspark.sql import functions as F

from adfs_spark.operators.find import (
    Comparator,
    indexed_find,
    is_valid,
    live_view,
    paginate,
)


def test_point_lookup(tables):
    got = indexed_find(tables["orders"], ["o_orderkey"], [42]).collect()
    assert len(got) == 1 and got[0]["o_orderkey"] == 42


def test_range_with_limit_offset(tables):
    got = indexed_find(
        tables["orders"], ["o_orderkey"], [100], cmp=Comparator.GE, limit=10, offset=5
    ).collect()
    keys = [r["o_orderkey"] for r in got]
    assert keys == list(range(105, 115))


def test_composite_prefix(tables):
    li = tables["lineitem"]
    one_key = indexed_find(li, ["l_orderkey", "l_linenumber"], [1])
    two_key = indexed_find(li, ["l_orderkey", "l_linenumber"], [1, 2])
    n1, n2 = one_key.count(), two_key.count()
    assert n1 >= n2 and n2 <= 1


def test_in_comparator(tables):
    got = indexed_find(
        tables["orders"], ["o_orderstatus"], [["F", "O"]], cmp=Comparator.IN
    )
    assert got.filter(~F.col("o_orderstatus").isin("F", "O")).count() == 0


def test_null_key_is_null_probe(tables):
    got = indexed_find(tables["orders"], ["o_orderstatus"], [None])
    assert got.count() == 0


def test_live_view_strips_tombstones(tables):
    df = tables["orders"].withColumn(
        "version",
        F.when(F.col("o_orderkey") % 2 == 0, -(F.col("o_orderkey") + 1)).otherwise(
            F.col("o_orderkey") + 1
        ),
    )
    live = live_view(df)
    assert live.filter(F.col("o_orderkey") % 2 == 0).count() == 0
    assert live.count() == df.filter(F.col("o_orderkey") % 2 == 1).count()


def test_paginate_keyset(tables):
    nat = tables["nation"]
    page1 = paginate(nat, ["n_name"], limit=5).collect()
    page2 = paginate(nat, ["n_name"], start_after=page1[-1]["n_name"], limit=5).collect()
    names = [r["n_name"] for r in page1 + page2]
    assert names == sorted(names) and len(set(names)) == 10


def test_is_valid(tables):
    assert is_valid(tables["orders"], ["o_orderkey"], [1])
    assert not is_valid(tables["orders"], ["o_orderkey"], [-999])
