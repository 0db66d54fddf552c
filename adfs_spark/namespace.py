"""Namespace domain API — the FileProtocol verb surface over DataFrames.

Mirrors the reference's public namespace API (FileProtocol.java:26-60:
create / mkdirs / getFileInfo / getListing / getDescendant / rename /
delete / setReplication / setTimes / complete) implemented through
layer-3 operators over a :class:`~adfs_spark.storage.VersionedTable`
holding the ``file`` table (File.java:30-58 schema).

Semantics preserved from the reference write path:
- mkdirs is idempotent on existing directories but fails on a file/dir
  type change (FileRepository.insertInternal :163-167);
- create/mkdir require the parent to exist and be a directory
  (:204-211);
- non-recursive delete of a non-empty directory fails (guarded delete,
  FileRepository.deleteInternal :288-305);
- rename moves a subtree by re-pointing one parentId edge and touches
  both parents' mtime (FileRepository.updateInternal :226-286);
- id allocation is sequential from the table max (the reference uses
  random-probe unique ids, U5 FileRepository.getUniqueIdAndLock
  :307-374 — collision-free-by-construction replaces the probe loop).

Deliberately absent, matching the reference: ``setQuota`` is an empty
stub in the fork (FSNamesystem.java:1480-1482 is ``// TODO:adfs``; no
quota column exists in File.java) — quota-style accounting is instead
answerable via :meth:`Namespace.content_summary` (A4).

This is a metadata-scale API: driver-side loops run once per *path
component* (depth ≤ ~16), never per row; the namespace table itself is
only touched through distributed operators.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from adfs_spark.operators.find import paginate
from adfs_spark.operators.hierarchy import (
    ROOT_ID,
    children,
    descendants,
    split_path,
)
from adfs_spark.schema import FILE, TableSpec
from adfs_spark.storage import VersionedTable

DIR_LENGTH = -1  # File.isDir: length == -1 (File.java:144-146)


class NamespaceError(Exception):
    pass


@dataclass
class Namespace:
    table: VersionedTable

    # -- construction ------------------------------------------------------

    @classmethod
    def create_at(cls, spark: SparkSession, root: str) -> "Namespace":
        """Create an empty namespace (root row id=0, parity with
        FileRepository.createMeta :99-107)."""
        t = VersionedTable(spark, FILE, root)
        root_row = spark.createDataFrame(
            [(ROOT_ID, ROOT_ID, "", DIR_LENGTH, 0, 0, 0, 0, 0, None, 0)],
            FILE.struct_type(include_version=False),
        )
        t.init(root_row)
        return cls(t)

    def ns(self) -> DataFrame:
        return self.table.live()

    # -- lookups -----------------------------------------------------------

    def _resolve(self, path: str) -> Row | None:
        """H1: per-component (parentId, name) descent."""
        cur_id = ROOT_ID
        row = None
        ns = self.ns()
        for part in split_path(path):
            got = ns.filter(
                (F.col("parentId") == cur_id) & (F.col("name") == part)
            ).take(1)
            if not got:
                return None
            row = got[0]
            cur_id = row["id"]
        if row is None:  # root itself
            return ns.filter(F.col("id") == ROOT_ID).take(1)[0]
        return row

    def get_file_info(self, path: str) -> Row | None:
        """getFileInfo (FileProtocol; FSNamesystem.getFileInfo)."""
        return self._resolve(path)

    def exists(self, path: str) -> bool:
        return self._resolve(path) is not None

    def get_listing(
        self, path: str, start_after: str | None = None, limit: int | None = None
    ) -> DataFrame:
        """getListing with working keyset pagination (the fork ignores
        startAfter, FSNamesystem.getListing :1658-1661)."""
        row = self._resolve(path)
        if row is None:
            raise NamespaceError(f"no such path: {path}")
        kids = children(self.ns(), row["id"])
        return paginate(kids, ["name"], start_after=start_after, limit=limit)

    def get_descendants(self, path: str, include_self: bool = False) -> DataFrame:
        """getDescendant (StateManager.findFileDescendantByPath :722-755)."""
        row = self._resolve(path)
        if row is None:
            raise NamespaceError(f"no such path: {path}")
        return descendants(self.ns(), [row["id"]], include_self=include_self)

    def content_summary(self, path: str) -> Row:
        """A4: SUM(length)/COUNT(files)/COUNT(dirs) over the subtree
        (FSNamesystem.getContentSummary :1462-1473)."""
        from adfs_spark.operators.aggregates import content_summary as cs

        return cs(self.get_descendants(path, include_self=True)).first()

    # -- mutations ---------------------------------------------------------

    def _next_id(self) -> int:
        # max over the full snapshot (tombstones included) — ids are never
        # reused, matching U5's unique-id guarantee
        row = self.table.snapshot().agg(F.max("id")).first()
        return int(row[0] or 0) + 1

    def mkdirs(self, path: str) -> int:
        """H6: mkdir -p — idempotent per existing dir component; fails
        if a component exists as a file (type-change forbidden,
        FileRepository.insertInternal :163-167).  Returns the deepest
        directory id."""
        cur_id = ROOT_ID
        now = int(time.time() * 1000)
        for part in split_path(path):
            got = self.ns().filter(
                (F.col("parentId") == cur_id) & (F.col("name") == part)
            ).take(1)
            if got:
                if got[0]["length"] != DIR_LENGTH:
                    raise NamespaceError(f"{part} exists and is not a directory")
                cur_id = got[0]["id"]
                continue
            new_id = self._next_id()
            self._insert_row(new_id, cur_id, part, DIR_LENGTH, 0, 0, now)
            cur_id = new_id
        return cur_id

    def create(
        self,
        path: str,
        block_size: int = 67108864,
        replication: int = 3,
        overwrite: bool = False,
        lease_holder: str | None = None,
    ) -> int:
        """create (startFileInternal :842-870): parent must exist and be
        a directory; existing file replaced only with overwrite."""
        parts = split_path(path)
        if not parts:
            raise NamespaceError("cannot create root")
        parent = "/".join(parts[:-1])
        prow = self._resolve("/" + parent if parent else "/")
        if prow is None:
            raise NamespaceError(f"parent does not exist: /{parent}")
        if prow["length"] != DIR_LENGTH:
            raise NamespaceError(f"parent is not a directory: /{parent}")
        existing = self.ns().filter(
            (F.col("parentId") == prow["id"]) & (F.col("name") == parts[-1])
        ).take(1)
        if existing:
            if existing[0]["length"] == DIR_LENGTH:
                raise NamespaceError(f"{path} exists and is a directory")
            if not overwrite:
                raise NamespaceError(f"{path} already exists")
            self.table.delete_where(F.col("id") == existing[0]["id"])
        new_id = self._next_id()
        now = int(time.time() * 1000)
        self._insert_row(
            new_id, prow["id"], parts[-1], 0, block_size, replication, now, lease_holder
        )
        return new_id

    def _insert_row(
        self,
        id_: int,
        parent_id: int,
        name: str,
        length: int,
        block_size: int,
        replication: int,
        now: int,
        lease_holder: str | None = None,
    ) -> None:
        spark = self.table.spark
        row = spark.createDataFrame(
            [
                (
                    id_,
                    parent_id,
                    name,
                    length,
                    block_size,
                    replication,
                    now,
                    now,
                    0,
                    lease_holder,
                    0,
                )
            ],
            FILE.struct_type(include_version=False),
        )
        self.table.upsert(row, overwrite=False)

    def rename(self, src: str, dst_parent: str, new_name: str | None = None) -> None:
        """rename/move: re-point the parentId edge (subtree follows for
        free — adjacency list), touch both parents' mtime
        (FileRepository.updateInternal :226-286)."""
        srow = self._resolve(src)
        if srow is None:
            raise NamespaceError(f"no such path: {src}")
        drow = self._resolve(dst_parent)
        if drow is None or drow["length"] != DIR_LENGTH:
            raise NamespaceError(f"destination parent invalid: {dst_parent}")
        # moving a dir under itself/its own subtree would orphan a cycle.
        # Cycle probe is a distributed filter + take(1) — the subtree id
        # set stays a DataFrame, never a driver-side Python set (the
        # reference's set-based check, StateManager.deleteFileByFile
        # :604-632, done without materializing the set).
        if drow["id"] == srow["id"]:
            raise NamespaceError("cannot rename a directory into itself")
        subtree = descendants(self.ns(), [srow["id"]], include_self=True)
        if subtree.filter(F.col("id") == drow["id"]).take(1):
            raise NamespaceError(
                f"cannot move {src} into its own subtree {dst_parent}"
            )
        name = new_name or srow["name"]
        clash = self.ns().filter(
            (F.col("parentId") == drow["id"]) & (F.col("name") == name)
        ).take(1)
        if clash:
            raise NamespaceError(f"destination already exists: {dst_parent}/{name}")
        now = int(time.time() * 1000)
        self.table.update_where(
            F.col("id") == srow["id"],
            {"parentId": F.lit(drow["id"]).cast("long"), "name": F.lit(name)},
        )
        self.table.update_where(
            F.col("id").isin([srow["parentId"], drow["id"]]),
            {"mtime": F.lit(now).cast("long")},
        )

    def delete(self, path: str, recursive: bool = False) -> int:
        """H5: guarded recursive delete — tombstones the whole subtree
        (StateManager.deleteFileByFile :604-632). Returns rows deleted."""
        row = self._resolve(path)
        if row is None:
            raise NamespaceError(f"no such path: {path}")
        if row["id"] == ROOT_ID:
            raise NamespaceError("cannot delete root")
        kids = children(self.ns(), row["id"]).take(1)
        if kids and not recursive:
            raise NamespaceError(f"directory not empty: {path}")
        # Set-based tombstone: the descendant id set stays distributed
        # (semi-join into delete_where_keys) — deleting a huge directory
        # never collects ids to the driver or builds a giant isin literal.
        keys = self.get_descendants(path, include_self=True).select("id")
        return self.table.delete_where_keys(keys)

    def set_replication(self, path: str, replication: int) -> None:
        """setReplication — U2 field-masked update (File.REPLICATION mask)."""
        row = self._resolve(path)
        if row is None or row["length"] == DIR_LENGTH:
            raise NamespaceError(f"not a file: {path}")
        self.table.update_where(
            F.col("id") == row["id"], {"replication": F.lit(replication).cast("byte")}
        )

    def set_times(self, path: str, mtime: int, atime: int) -> None:
        """setTimes — U2 (File.MTIME|ATIME masks)."""
        row = self._resolve(path)
        if row is None:
            raise NamespaceError(f"no such path: {path}")
        self.table.update_where(
            F.col("id") == row["id"],
            {"mtime": F.lit(mtime).cast("long"), "atime": F.lit(atime).cast("long")},
        )

    def complete_file(self, path: str, length: int) -> None:
        """complete (completeFile :1102-1131): set final length (A3 sum
        done by the caller from the block table), drop the lease."""
        row = self._resolve(path)
        if row is None or row["length"] == DIR_LENGTH:
            raise NamespaceError(f"not a file: {path}")
        self.table.update_where(
            F.col("id") == row["id"],
            {
                "length": F.lit(length).cast("long"),
                "leaseHolder": F.lit(None).cast("string"),
            },
        )

    def paths(self) -> DataFrame:
        """H2: the computed path column for every live row."""
        from adfs_spark.operators.hierarchy import path_column

        return path_column(self.ns())
