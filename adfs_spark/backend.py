"""Commit/lock/publish primitives behind a pluggable backend.

Every durability decision the engine makes — reserving a commit id,
stealing a crashed writer's lease, publishing a manifest or overlay
watermark — reduces to SIX storage verbs.  The reference keeps its
storage layer pluggable the same way (``DatabaseExecutor`` with three
backends, HDFS/com/taobao/adfs/database/DatabaseExecutor.java:82-92);
here the protocol code in :mod:`adfs_spark.storage` calls only this
interface, never ``os.*`` directly, so the commit protocol's
correctness is independent of the medium.

Verb → medium mapping:

=================  =======================  ==========================
verb               local filesystem         object store (S3-class)
=================  =======================  ==========================
put_if_absent      open(O_CREAT|O_EXCL)     conditional PUT
                                            (If-None-Match: *)
replace            write tmp + os.replace   PUT (atomic object create/
                                            overwrite)
read               open/read                GET
delete             os.unlink                DELETE
list               os.listdir               LIST prefix
mtime              os.path.getmtime         HEAD → Last-Modified
=================  =======================  ==========================

All six exist natively on S3 (conditional PUT shipped 2024), GCS
(``x-goog-if-generation-match: 0``), ABFS, and HDFS (create-no-
overwrite + rename).  The lock-lease steal additionally needs mtime to
move forward when a lock is re-created, which every listed medium
guarantees (a new object gets a new Last-Modified).

:class:`MemoryCommitBackend` is the injected fake proving the protocol
needs only these verbs — it emulates object-store semantics (no
directories, conditional create, last-write-wins replace) in a dict and
runs the same protocol test suites as the local backend.
"""

from __future__ import annotations

import os
import threading
import time


class CommitBackend:
    """Abstract commit-plane storage: small metadata objects (locks,
    commit manifests, overlay watermarks) addressed by opaque string
    keys.  Data-plane I/O (parquet buckets, changelog files) stays with
    Spark and is NOT routed through this interface."""

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Atomically create ``key`` with ``data`` iff it does not
        exist.  Returns True on success, False when the key exists —
        the reservation primitive (local: O_CREAT|O_EXCL; S3:
        conditional PUT)."""
        raise NotImplementedError

    def replace(self, key: str, data: bytes) -> None:
        """Atomically publish ``data`` at ``key`` — readers see the old
        content or the new full content, never a torn write (local:
        tmp + rename; S3: PUT is atomic per object)."""
        raise NotImplementedError

    def read(self, key: str) -> bytes | None:
        """Full content of ``key``, or None when absent."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Remove ``key``; absent keys are a no-op (idempotent)."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """Names (final path component) of keys directly under
        ``prefix``; empty when the prefix has none."""
        raise NotImplementedError

    def mtime(self, key: str) -> float | None:
        """Last-modified time (epoch seconds) of ``key``, or None when
        absent — drives the lock-lease TTL."""
        raise NotImplementedError

    # -- conditional verbs (CAS tier) ----------------------------------
    #
    # The compare-and-swap pair the election lease needs (r6 ADVICE:
    # renew-vs-steal and steal-vs-claim races are unguardable with
    # blind replace/delete).  ``expected`` is the full payload the
    # caller last read — value-compare, not mtime-compare, because
    # every listed medium can express it: S3 PUT/…-If-Match on the
    # content ETag, GCS if-generation-match, SQLite ``WHERE data=?``,
    # local fs under a per-directory flock.  S3 proper lacks
    # conditional DELETE: there, map ``delete_if_value`` to a
    # conditional PUT of a tombstone payload + plain DELETE (the
    # fencing effect is identical — the doomed lease can never be
    # renewed, because renew's CAS no longer matches).
    #
    # Atomicity contract: conditional verbs are atomic against OTHER
    # conditional verbs on the same key.  A plain ``replace`` can still
    # clobber anything (exactly as a plain object-store PUT can); keys
    # that need protection must be written exclusively through the
    # conditional verbs once contended.

    def replace_if_value(self, key: str, data: bytes, expected: bytes) -> bool:
        """Atomically replace ``key`` with ``data`` iff its current
        content equals ``expected``; returns False (no write) when the
        key is absent or holds anything else.  Bumps mtime even when
        ``data == expected`` — the CAS-touch heartbeat shape."""
        raise NotImplementedError

    def delete_if_value(self, key: str, expected: bytes) -> bool:
        """Atomically delete ``key`` iff its current content equals
        ``expected``; returns False (no delete) otherwise."""
        raise NotImplementedError


class LocalCommitBackend(CommitBackend):
    """POSIX-filesystem implementation — the only place in the commit
    plane that touches ``os.*``."""

    def put_if_absent(self, key: str, data: bytes) -> bool:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        try:
            fd = os.open(key, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
        finally:
            os.close(fd)
        return True

    def replace(self, key: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = f"{key}.tmp{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)

    def read(self, key: str) -> bytes | None:
        try:
            with open(key, "rb") as f:
                return f.read()
        except OSError:
            return None

    def delete(self, key: str) -> None:
        try:
            os.unlink(key)
        except OSError:
            pass

    def list(self, prefix: str) -> list[str]:
        try:
            # dot-names are reserved for backend internals (the CAS
            # flock sidecar) — same convention as object-store layouts
            # hiding _metadata/. entries from table listings
            return [n for n in os.listdir(prefix) if not n.startswith(".")]
        except OSError:
            return []

    def mtime(self, key: str) -> float | None:
        try:
            return os.path.getmtime(key)
        except OSError:
            return None

    def _cas_lock(self, key: str):
        """Per-directory advisory flock serializing the conditional
        verbs (plain verbs stay lock-free; see the CAS atomicity
        contract on :class:`CommitBackend`).  A sidecar ``.caslock``
        file is used because flocking ``key`` itself would pin the OLD
        inode across the tmp+rename replace, letting a second CAS
        compare against dead content."""
        import fcntl

        d = os.path.dirname(key) or "."
        os.makedirs(d, exist_ok=True)
        f = open(os.path.join(d, ".caslock"), "a+b")
        fcntl.flock(f.fileno(), fcntl.LOCK_EX)
        return f

    def replace_if_value(self, key: str, data: bytes, expected: bytes) -> bool:
        import fcntl

        f = self._cas_lock(key)
        try:
            if self.read(key) != expected:
                return False
            self.replace(key, data)
            # equal-content rewrite on a coarse-mtime fs could leave
            # mtime unchanged; force it forward (the CAS-touch contract).
            # Plain verbs are lock-free against CAS verbs, so the key may
            # vanish between replace and utime — the CAS itself already
            # succeeded, a vanished key just means a plain delete won.
            try:
                os.utime(key)
            except OSError:
                pass
            return True
        finally:
            fcntl.flock(f.fileno(), fcntl.LOCK_UN)
            f.close()

    def delete_if_value(self, key: str, expected: bytes) -> bool:
        import fcntl

        f = self._cas_lock(key)
        try:
            if self.read(key) != expected:
                return False
            self.delete(key)
            return True
        finally:
            fcntl.flock(f.fileno(), fcntl.LOCK_UN)
            f.close()


class SqliteCommitBackend(CommitBackend):
    """Database-backed commit plane — a REAL durable second medium with
    genuinely non-POSIX semantics, and the closest engine analog of the
    reference's own storage choice: its pluggable executors speak the
    MySQL protocol (DatabaseExecutor.java:82-92 keeps three database
    backends behind one interface; the namenode state lives in mysqld).

    Keys are rows in one ``kv`` table.  The conditional create is a
    primary-key INSERT (the database's uniqueness guarantee, not
    O_CREAT|O_EXCL); publish is an UPSERT inside a transaction (not
    tmp+rename); cross-process mutual exclusion comes from SQLite's own
    file locking (WAL journal + busy timeout), which works across
    independent processes sharing the db file.  mtime is stored
    per-row and moves forward on every insert/replace — the
    Last-Modified contract the lock-lease steal needs.

    One connection per operation: commit-plane traffic is a handful of
    small metadata ops per write, and per-op connections keep the
    backend safe under any thread/process mix with zero shared state.
    """

    def __init__(self, db_path: str) -> None:
        import sqlite3

        self.db_path = db_path
        d = os.path.dirname(db_path)
        if d:
            os.makedirs(d, exist_ok=True)
        with sqlite3.connect(db_path, timeout=30) as conn:
            conn.execute("PRAGMA journal_mode=WAL")
            conn.execute(
                "CREATE TABLE IF NOT EXISTS kv ("
                "key TEXT PRIMARY KEY, data BLOB NOT NULL, mtime REAL NOT NULL)"
            )

    def _conn(self):
        import sqlite3

        conn = sqlite3.connect(self.db_path, timeout=30)
        conn.execute("PRAGMA busy_timeout=30000")
        return conn

    def put_if_absent(self, key: str, data: bytes) -> bool:
        import sqlite3

        with self._conn() as conn:
            try:
                conn.execute(
                    "INSERT INTO kv (key, data, mtime) VALUES (?, ?, ?)",
                    (key, bytes(data), time.time()),
                )
                return True
            except sqlite3.IntegrityError:
                return False

    def replace(self, key: str, data: bytes) -> None:
        with self._conn() as conn:
            conn.execute(
                "INSERT INTO kv (key, data, mtime) VALUES (?, ?, ?) "
                "ON CONFLICT(key) DO UPDATE SET "
                "data = excluded.data, mtime = excluded.mtime",
                (key, bytes(data), time.time()),
            )

    def read(self, key: str) -> bytes | None:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT data FROM kv WHERE key = ?", (key,)
            ).fetchone()
            return bytes(row[0]) if row else None

    def delete(self, key: str) -> None:
        with self._conn() as conn:
            conn.execute("DELETE FROM kv WHERE key = ?", (key,))

    def list(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        # substr match instead of LIKE/GLOB: keys are arbitrary path
        # strings and must not be interpreted as patterns
        with self._conn() as conn:
            rows = conn.execute(
                "SELECT key FROM kv WHERE substr(key, 1, ?) = ?",
                (len(p), p),
            ).fetchall()
        return sorted({r[0][len(p):].split("/", 1)[0] for r in rows})

    def mtime(self, key: str) -> float | None:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT mtime FROM kv WHERE key = ?", (key,)
            ).fetchone()
            return float(row[0]) if row else None

    def replace_if_value(self, key: str, data: bytes, expected: bytes) -> bool:
        # the database's own row lock makes the compare-and-set one
        # statement — the WHERE clause IS the compare
        with self._conn() as conn:
            cur = conn.execute(
                "UPDATE kv SET data = ?, mtime = ? WHERE key = ? AND data = ?",
                (bytes(data), time.time(), key, bytes(expected)),
            )
            return cur.rowcount == 1

    def delete_if_value(self, key: str, expected: bytes) -> bool:
        with self._conn() as conn:
            cur = conn.execute(
                "DELETE FROM kv WHERE key = ? AND data = ?",
                (key, bytes(expected)),
            )
            return cur.rowcount == 1


def backend_from_env() -> CommitBackend:
    """Default commit backend, switchable without code changes so the
    protocol suites run UNMODIFIED against a second real medium:
    ``SPARK_GRAFT_COMMIT_BACKEND=sqlite:/path/commit.db`` routes every
    default-constructed table through the database backend;
    ``http://host:port`` routes through the conditional-PUT object
    store (:mod:`adfs_spark.objstore`); unset (or ``local``) keeps the
    POSIX backend."""
    kind = os.environ.get("SPARK_GRAFT_COMMIT_BACKEND", "local")
    if kind.startswith("sqlite:"):
        return SqliteCommitBackend(kind.split(":", 1)[1])
    if kind.startswith("http://") or kind.startswith("https://"):
        from adfs_spark.objstore import HttpObjectStoreCommitBackend

        return HttpObjectStoreCommitBackend(kind)
    return LocalCommitBackend()


class MemoryCommitBackend(CommitBackend):
    """In-memory object-store fake: flat key space, conditional create,
    atomic replace, prefix listing.  Injected by the protocol tests to
    prove :mod:`adfs_spark.storage` needs only the six verbs (and by
    construction exercises the S3 shape: no directories, no partial
    writes, mtime from object creation)."""

    def __init__(self) -> None:
        self._objects: dict[str, tuple[bytes, float]] = {}
        self._mu = threading.Lock()

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._mu:
            if key in self._objects:
                return False
            self._objects[key] = (bytes(data), time.time())
            return True

    def replace(self, key: str, data: bytes) -> None:
        with self._mu:
            self._objects[key] = (bytes(data), time.time())

    def read(self, key: str) -> bytes | None:
        with self._mu:
            got = self._objects.get(key)
            return got[0] if got else None

    def delete(self, key: str) -> None:
        with self._mu:
            self._objects.pop(key, None)

    def list(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        with self._mu:
            return sorted(
                {
                    k[len(p):].split("/", 1)[0]
                    for k in self._objects
                    if k.startswith(p)
                }
            )

    def mtime(self, key: str) -> float | None:
        with self._mu:
            got = self._objects.get(key)
            return got[1] if got else None

    def replace_if_value(self, key: str, data: bytes, expected: bytes) -> bool:
        with self._mu:
            got = self._objects.get(key)
            if got is None or got[0] != bytes(expected):
                return False
            self._objects[key] = (bytes(data), time.time())
            return True

    def delete_if_value(self, key: str, expected: bytes) -> bool:
        with self._mu:
            got = self._objects.get(key)
            if got is None or got[0] != bytes(expected):
                return False
            del self._objects[key]
            return True
