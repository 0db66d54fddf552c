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


def _closure_reference(ns, id_col="id", parent_col="parentId", root_id=0, max_depth=64):
    """The pre-r9 iterative-join transitive closure, kept as the
    semantics oracle for the fused form (one big-table pass)."""
    from pyspark.sql import functions as F

    edges = ns.select(
        F.col(id_col).alias("node"), F.col(parent_col).alias("anc")
    ).filter(F.col(parent_col).isNotNull())
    hop = ns.select(
        F.col(id_col).alias("_h_id"), F.col(parent_col).alias("_h_parent")
    )
    out = edges
    cur = edges
    for _ in range(max_depth):
        cur = (
            cur.filter(F.col("anc") != root_id)
            .join(hop, cur["anc"] == hop["_h_id"])
            .select("node", F.col("_h_parent").alias("anc"))
        ).localCheckpoint(eager=True)
        if not cur.take(1):
            break
        out = out.unionByName(cur)
    return out


def test_ancestor_closure_fused_equals_iterative(spark):
    """The fused closure (r9: depth probed on the internal-node map,
    one big-table pass) is pair-for-pair identical to the iterative
    join — including the edge semantics: dangling parent pointers end
    the chain, a NULL-parent dir that IS referenced emits its
    (node, NULL) pair then walks no further, and chains deeper than
    the 8-level lineage-truncation stride still close."""
    from adfs_spark.operators.hierarchy import ancestor_closure

    deep = [(i, i - 1, f"d{i}") for i in range(1, 12)]  # chain depth 11 > 8
    trees = [
        # dangling parent (6->99), NULL parent leaf (7), NULL-parent
        # dir 8 referenced by 9
        [(1, 0, "a"), (2, 1, "b"), (3, 2, "c"), (6, 99, "x"),
         (7, None, "y"), (8, None, "z"), (9, 8, "w")],
        deep,
        [],  # empty namespace
    ]
    for rows in trees:
        ns = spark.createDataFrame(rows, "id: long, parentId: long, name: string")
        key = lambda t: (t[0], -1 if t[1] is None else t[1])
        want = sorted(
            [(r["node"], r["anc"]) for r in _closure_reference(ns).collect()], key=key
        )
        got = sorted(
            [(r["node"], r["anc"]) for r in ancestor_closure(ns).collect()], key=key
        )
        assert got == want, f"closure mismatch on {rows[:3]}..."
