from __future__ import annotations

import pytest

from adfs_spark.plans import FindPlan, execute_plan


def test_plan_roundtrip_and_execute(tables):
    plan = FindPlan(
        table="orders",
        index_columns=("o_orderkey",),
        keys=(100,),
        comparator="GE",
        limit=5,
        projection=("o_orderkey", "o_totalprice"),
    )
    replayed = FindPlan.from_json(plan.to_json())
    assert replayed == plan
    got = execute_plan(replayed, tables).collect()
    assert [r["o_orderkey"] for r in got] == [100, 101, 102, 103, 104]
    assert got[0].asDict().keys() == {"o_orderkey", "o_totalprice"}


def test_plan_in_comparator(tables):
    plan = FindPlan(
        table="orders",
        index_columns=("o_orderstatus",),
        keys=(["P"],),
        comparator="IN",
        projection=("o_orderkey",),
    )
    assert execute_plan(plan, tables).count() > 0


def test_plan_unknown_table(tables):
    with pytest.raises(KeyError):
        execute_plan(FindPlan("nope", ("x",), (1,)), tables)
