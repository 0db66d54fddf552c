"""CommitBackend abstraction: the commit/lock/publish protocol runs on
exactly six storage verbs (put_if_absent / replace / read / delete /
list / mtime) — proven by running the same protocol suites against the
local-FS backend and an injected in-memory object-store fake.  Parity
goal: the reference's pluggable storage layer
(HDFS/com/taobao/adfs/database/DatabaseExecutor.java:82-92, three
backends behind one interface)."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from adfs_spark.backend import (
    LocalCommitBackend,
    MemoryCommitBackend,
    SqliteCommitBackend,
)
from adfs_spark.schema import ColumnSpec, TableSpec
from adfs_spark.storage import TransactionLog, VersionedTable

SPEC = TableSpec(
    name="bk",
    columns=(ColumnSpec("k", "long"), ColumnSpec("v", "string")),
    primary_key=("k",),
    versioned=True,
)

def _sqlite_factory(tmp_path):
    return SqliteCommitBackend(str(tmp_path / "commit.db"))


# factories take tmp_path so the database backend gets a per-test file;
# __name__ keeps the parametrized test ids readable
_sqlite_factory.__name__ = "SqliteCommitBackend"

# one mock object-store server for the whole module (keys embed
# tmp_path, so tests stay isolated on the shared server)
_OBJSTORE: dict = {"server": None}


def _objstore_factory(tmp_path):
    from adfs_spark.objstore import (
        HttpObjectStoreCommitBackend,
        ObjectStoreServer,
    )

    if _OBJSTORE["server"] is None:
        _OBJSTORE["server"] = ObjectStoreServer().start()
    return HttpObjectStoreCommitBackend(_OBJSTORE["server"].url)


_objstore_factory.__name__ = "HttpObjectStoreCommitBackend"
BACKENDS = [
    lambda tmp_path: LocalCommitBackend(),
    lambda tmp_path: MemoryCommitBackend(),
    _sqlite_factory,
    _objstore_factory,
]
BACKEND_IDS = ["local", "memory", "sqlite", "objstore"]


def _mk(spark, tmp_path, backend, n=10, name="t", **kw):
    t = VersionedTable(spark, SPEC, str(tmp_path / name), backend=backend, **kw)
    t.init(
        spark.createDataFrame([(i, f"v{i}") for i in range(n)], "k: long, v: string")
    )
    return t


def _live(t):
    return {r["k"]: r["v"] for r in t.live().collect()}


# -- backend unit semantics ------------------------------------------------


@pytest.mark.parametrize("backend_cls", BACKENDS, ids=BACKEND_IDS)
def test_backend_verbs(tmp_path, backend_cls):
    be = backend_cls(tmp_path)
    key = str(tmp_path / "commits" / "1.lock")
    assert be.read(key) is None
    assert be.mtime(key) is None
    assert be.put_if_absent(key, b"a")
    assert not be.put_if_absent(key, b"b")  # conditional create
    assert be.read(key) == b"a"
    assert be.mtime(key) is not None
    be.replace(key, b"c")  # atomic overwrite
    assert be.read(key) == b"c"
    names = be.list(str(tmp_path / "commits"))
    assert "1.lock" in names
    be.delete(key)
    be.delete(key)  # idempotent
    assert be.read(key) is None
    assert be.list(str(tmp_path / "commits")) == []


# -- protocol suites over both backends ------------------------------------


@pytest.mark.parametrize("backend_cls", BACKENDS, ids=BACKEND_IDS)
def test_write_protocol_roundtrip(spark, tmp_path, backend_cls):
    """init / upsert / update / delete / compact through either
    backend: same results, commit ids advance, locks drain."""
    t = _mk(spark, tmp_path, backend_cls(tmp_path), name="rt")
    t.upsert(spark.createDataFrame([(3, "X"), (20, "new")], "k: long, v: string"))
    t.update_where(F.col("k") == 0, {"v": F.lit("zero")}, mode="append")
    t.delete_where(F.col("k") == 1, mode="append")
    t.compact()
    live = _live(t)
    assert live[3] == "X" and live[20] == "new" and live[0] == "zero"
    assert 1 not in live
    assert t.last_commit_id() >= 5
    # every reservation was released: no stale .lock objects remain
    assert not [
        f for f in t.backend.list(t.commits_path) if f.endswith(".lock")
    ]


@pytest.mark.parametrize("backend_cls", BACKENDS, ids=BACKEND_IDS)
def test_crashed_append_fenced_either_backend(spark, tmp_path, backend_cls, monkeypatch):
    t = _mk(spark, tmp_path, backend_cls(tmp_path), name="cr")
    real = VersionedTable._mark_visible

    def boom(self, vt_new):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(VersionedTable, "_mark_visible", boom)
    with pytest.raises(RuntimeError):
        t.upsert(
            spark.createDataFrame([(99, "GHOST")], "k: long, v: string"),
            mode="append",
        )
    monkeypatch.setattr(VersionedTable, "_mark_visible", real)
    assert 99 not in _live(t)
    meta = t._overlay_meta()
    assert meta["aborted"], "crashed tail must be fenced"
    # later writes stamp past the fence and stay visible
    t.upsert(spark.createDataFrame([(7, "seven")], "k: long, v: string"), mode="append")
    assert _live(t)[7] == "seven"


@pytest.mark.parametrize("backend_cls", BACKENDS, ids=BACKEND_IDS)
def test_txn_atomic_commit_either_backend(spark, tmp_path, backend_cls):
    """Two tables, one transaction: both watermarks flip in one
    manifest commit regardless of backend."""
    be = backend_cls(tmp_path)
    a = _mk(spark, tmp_path, be, name="ta")
    b = _mk(spark, tmp_path, be, name="tb")
    log = TransactionLog(str(tmp_path / "txn"), backend=be)
    log.enroll(a)
    log.enroll(b)
    with log.transaction():
        a.upsert(spark.createDataFrame([(50, "A")], "k: long, v: string"))
        b.upsert(spark.createDataFrame([(60, "B")], "k: long, v: string"))
    assert _live(a)[50] == "A" and _live(b)[60] == "B"
    # aborted verb publishes neither
    with pytest.raises(RuntimeError):
        with log.transaction():
            a.upsert(spark.createDataFrame([(70, "X")], "k: long, v: string"))
            raise RuntimeError("verb failed")
    assert 70 not in _live(a)


@pytest.mark.parametrize("backend_cls", BACKENDS, ids=BACKEND_IDS)
def test_stale_lock_steal_either_backend(spark, tmp_path, backend_cls, monkeypatch):
    """A crashed writer's lock is stolen after the TTL on either
    medium (mtime drives the lease)."""
    import adfs_spark.storage as st

    t = _mk(spark, tmp_path, backend_cls(tmp_path), name="st")
    nxt = t.last_commit_id() + 1
    lock = f"{t.commits_path}/{nxt}.lock"
    assert t.backend.put_if_absent(lock, b"dead writer")
    monkeypatch.setattr(st, "LOCK_TTL_SEC", 0.0)
    t.upsert(spark.createDataFrame([(5, "five")], "k: long, v: string"))
    assert _live(t)[5] == "five"


def test_commit_plane_calls_no_os_primitives():
    """The protocol methods touch storage ONLY through the backend:
    no direct os-level create/rename/unlink/stat/listdir in any
    commit-plane function."""
    from adfs_spark import storage

    protocol_fns = [
        VersionedTable._reserve_commit,
        VersionedTable._transact,
        VersionedTable.last_commit_id,
        VersionedTable._local_overlay_meta,
        VersionedTable._write_overlay_meta,
        TransactionLog._reserve,
        TransactionLog._commit,
        TransactionLog.last_commit_id,
        TransactionLog.latest,
        storage._Transaction.__enter__,
        storage._Transaction.__exit__,
    ]
    forbidden = (
        "os.open", "os.replace", "os.unlink", "os.listdir",
        "os.makedirs", "os.path.getmtime", "O_CREAT", "O_EXCL",
    )
    for fn in protocol_fns:
        src = inspect.getsource(fn)
        for verb in forbidden:
            assert verb not in src, f"{fn.__qualname__} uses {verb} directly"


@pytest.mark.parametrize("backend_cls", BACKENDS, ids=BACKEND_IDS)
def test_backend_conditional_verbs(tmp_path, backend_cls):
    """replace_if_value / delete_if_value semantics on every medium:
    CAS succeeds only on exact current content, bumps mtime even for a
    same-content touch, and never fires on absent keys."""
    import time as _time

    be = backend_cls(tmp_path)
    key = str(tmp_path / "lease" / "leader")
    # absent key: both conditionals refuse
    assert not be.replace_if_value(key, b"x", b"x")
    assert not be.delete_if_value(key, b"x")
    assert be.put_if_absent(key, b"v1")
    # wrong expected: refuse, content untouched
    assert not be.replace_if_value(key, b"v2", b"WRONG")
    assert be.read(key) == b"v1"
    # right expected: swap
    assert be.replace_if_value(key, b"v2", b"v1")
    assert be.read(key) == b"v2"
    # CAS-touch: same content, mtime moves forward
    m0 = be.mtime(key)
    _time.sleep(0.01)
    assert be.replace_if_value(key, b"v2", b"v2")
    assert be.mtime(key) >= m0
    # conditional delete: wrong expected refuses, right one removes
    assert not be.delete_if_value(key, b"v1")
    assert be.read(key) == b"v2"
    assert be.delete_if_value(key, b"v2")
    assert be.read(key) is None
