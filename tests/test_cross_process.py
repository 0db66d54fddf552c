"""Cross-PROCESS concurrency proof for the optimistic commit sequence.

test_concurrent_writers_both_land runs two writers in one driver; the
O_CREAT|O_EXCL reservation (storage.py `_reserve_commit`) is exactly the
primitive that breaks across JVMs on some filesystems, so this spawns
two separate python/JVM processes against ONE table root and checks
that both writes land with disjoint versions (DistributedLocker.java
:103-160 is the reference's cross-writer serialization)."""

from __future__ import annotations

import os
import subprocess
import sys

WRITER = r"""
import sys
sys.path.insert(0, {repo!r})
root, tag, lo, hi = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .appName("xproc-" + tag)
    .getOrCreate()
)
from adfs_spark.schema import ColumnSpec, TableSpec
from adfs_spark.storage import VersionedTable
spec = TableSpec(
    name="cckv",
    columns=(ColumnSpec("k", "long"), ColumnSpec("v", "string")),
    primary_key=("k",),
    versioned=True,
)
t = VersionedTable(spark, spec, root)
rows = spark.createDataFrame([(i, tag) for i in range(lo, hi)], "k: long, v: string")
t.upsert(rows, mode="merge")
spark.stop()
print("DONE", tag)
"""


def test_two_jvm_writers_both_land(spark, tmp_path):
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = TableSpec(
        name="cckv",
        columns=(ColumnSpec("k", "long"), ColumnSpec("v", "string")),
        primary_key=("k",),
        versioned=True,
    )
    root = str(tmp_path / "cckv")
    t = VersionedTable(spark, spec, root)
    t.init(spark.createDataFrame([(-1, "seed"), (-2, "seed")], "k: long, v: string"))

    script = str(tmp_path / "writer.py")
    with open(script, "w") as f:
        f.write(WRITER.format(repo=repo))
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, script, root, tag, str(lo), str(hi)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for tag, lo, hi in (("alpha", 0, 50), ("beta", 50, 100))
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err.decode()[-2000:]
        assert b"DONE" in out

    # both writers' rows landed, none lost
    live = {r["k"]: r["v"] for r in t.live().collect()}
    assert all(live[i] == "alpha" for i in range(0, 50))
    assert all(live[i] == "beta" for i in range(50, 100))
    assert live[-1] == "seed"
    # versions are unique (disjoint commit windows, no collision)
    versions = [r["version"] for r in t.snapshot().collect()]
    assert len(versions) == len(set(versions)) == 102
    assert t.max_version() == 102
    # three finalized commits: init + one per writer (listed through the
    # backend so the check is medium-agnostic — the sqlite commit plane
    # has no directory to os.listdir)
    names = t.backend.list(t.commits_path)
    assert len([f for f in names if f.endswith(".commit")]) == 3
    assert not [f for f in names if f.endswith(".lock")]
