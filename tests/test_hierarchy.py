from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.operators.hierarchy import (
    children,
    descendants,
    path_column,
    recursive_delete_set,
    resolve_path,
    resolve_paths_batch,
)


@pytest.fixture(scope="module")
def ns(spark):
    # /           id=0 (implicit root)
    # /a          id=1
    # /a/b        id=2
    # /a/b/f1     id=3 (file)
    # /a/f2       id=4 (file)
    # /c          id=5
    rows = [
        (1, 0, "a", -1),
        (2, 1, "b", -1),
        (3, 2, "f1", 100),
        (4, 1, "f2", 50),
        (5, 0, "c", -1),
    ]
    return spark.createDataFrame(rows, "id: long, parentId: long, name: string, length: long")


def test_resolve_path(ns):
    got = resolve_path(ns, "/a/b/f1").orderBy("depth").collect()
    assert [r["id"] for r in got] == [1, 2, 3]


def test_resolve_path_missing(ns):
    got = resolve_path(ns, "/a/zzz/f1")
    assert got.count() <= 1  # partial chain only


def test_resolve_paths_batch(ns, spark):
    paths = spark.createDataFrame(
        [("/a/b/f1",), ("/a/f2",), ("/c",), ("/missing",)], "path: string"
    )
    got = {r["path"]: r["id"] for r in resolve_paths_batch(ns, paths).collect()}
    assert got == {"/a/b/f1": 3, "/a/f2": 4, "/c": 5}


def test_children(ns):
    assert sorted(r["id"] for r in children(ns, 1).collect()) == [2, 4]


def test_descendants(ns):
    got = descendants(ns, [1], include_self=True)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3, 4]
    levels = {r["id"]: r["level"] for r in got.collect()}
    assert levels[1] == 0 and levels[2] == 1 and levels[3] == 2


def test_path_column(ns):
    got = {r["id"]: r["path"] for r in path_column(ns).collect()}
    assert got[3] == "/a/b/f1" and got[5] == "/c" and got[1] == "/a"


def test_recursive_delete_guard(ns):
    with pytest.raises(ValueError):
        recursive_delete_set(ns, 1, recursive=False)
    ids = sorted(r["id"] for r in recursive_delete_set(ns, 1, recursive=True).collect())
    assert ids == [1, 2, 3, 4]


def test_rollup_sizes_all_directories(spark):
    from adfs_spark.operators.hierarchy import ancestor_closure, rollup_sizes

    #      0
    #    1   2
    #  3 4     5(file under 2)
    # files: 3->10, 4->20, 5->7
    ns = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "f1"), (4, 1, "f2"), (5, 2, "f3")],
        "id: long, parentId: long, name: string",
    )
    sizes = spark.createDataFrame(
        [(3, 10.0), (4, 20.0), (5, 7.0)], "id: long, size: double"
    )
    got = {
        r["id"]: (r["n_files"], r["total_size"])
        for r in rollup_sizes(ns, sizes).collect()
    }
    assert got == {1: (2, 30.0), 2: (1, 7.0), 0: (3, 37.0)}
    # closure sanity: node 3's ancestors are exactly {1, 0}
    anc = {
        (r["node"], r["anc"]) for r in ancestor_closure(ns).collect() if r["node"] == 3
    }
    assert anc == {(3, 1), (3, 0)}
