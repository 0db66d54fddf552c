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
            return os.listdir(prefix)
        except OSError:
            return []

    def mtime(self, key: str) -> float | None:
        try:
            return os.path.getmtime(key)
        except OSError:
            return None


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
