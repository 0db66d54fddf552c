"""Declarative table specs — the reference's annotation-driven data model.

The reference defines tables as Java classes annotated with
``@Database/@Table/@Column/@Index`` and turns them into DDL by
reflection (DistributedDataRepositoryBaseOnTable.java:684-763,
Utilities.java:1049).  Here a :class:`TableSpec` carries the same
information — name, typed columns, primary key, and secondary "index"
hints — and emits a Spark ``StructType`` (and ``CREATE TABLE`` DDL for
the SQL catalog).  Indexes have no physical analog in Spark; they are
retained as (a) documentation of which filter columns must be fast and
(b) partitioning/sort hints used by :mod:`adfs_spark.storage`.

Every versioned table implicitly carries a ``version`` long with
tombstone semantics: negative version = deleted row, ``abs(version)``
unique and monotonically increasing
(DistributedDataRepositoryBaseOnTable.java:544-545,316-330).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_MAP: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "array<float>": T.ArrayType(T.FloatType()),
}

VERSION_COL = "version"


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    type: str  # key into _TYPE_MAP
    nullable: bool = True

    def to_field(self) -> T.StructField:
        return T.StructField(self.name, _TYPE_MAP[self.type], self.nullable)


@dataclass(frozen=True)
class IndexSpec:
    """Secondary-index hint: ordered column list + uniqueness flag.

    Mirrors @Index(name, index, unique, columnIndex)
    (DistributedDataRepositoryBaseOnTable.java:814-823); e.g. the
    composite unique PID_NAME over (parentId, name) in File.java:38-41.
    """

    name: str
    columns: tuple[str, ...]
    unique: bool = False


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]
    primary_key: tuple[str, ...]
    indexes: tuple[IndexSpec, ...] = field(default_factory=tuple)
    versioned: bool = False

    def struct_type(self, include_version: bool = True) -> T.StructType:
        fields = [c.to_field() for c in self.columns]
        if (
            include_version
            and self.versioned
            and VERSION_COL not in {c.name for c in self.columns}
        ):
            fields.append(T.StructField(VERSION_COL, T.LongType(), False))
        return T.StructType(fields)

    def ddl(self, database: str = "nn_state") -> str:
        """Emit CREATE TABLE DDL (parity with parseTableDescription)."""
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in self.struct_type().fields)
        return f"CREATE TABLE IF NOT EXISTS {database}.{self.name} ({cols}) USING parquet"

    def column_names(self) -> list[str]:
        names = [c.name for c in self.columns]
        if self.versioned and VERSION_COL not in names:
            names.append(VERSION_COL)
        return names


def _cols(*pairs: tuple[str, str]) -> tuple[ColumnSpec, ...]:
    return tuple(ColumnSpec(n, t) for n, t in pairs)


# ---------------------------------------------------------------------------
# The four nn_state tables (File.java:30-58, Block.java:30-44,
# Datanode.java:32-57, Lease.java:12-18), re-declared as Spark specs.
# ---------------------------------------------------------------------------

FILE = TableSpec(
    name="file",
    columns=_cols(
        ("id", "long"),
        ("parentId", "long"),
        ("name", "string"),
        ("length", "long"),  # -1 ⇒ directory (File.java:144-146)
        ("blockSize", "int"),
        ("replication", "byte"),
        ("atime", "long"),
        ("mtime", "long"),
        ("owner", "int"),
        # POSIX mode bits (FsPermission short).  The fork's FileProtocol
        # declares setOwner/setPermission in the verb surface
        # (FileProtocol.java:26-60) but File.java:30-58 carries only the
        # int owner; the analytics engine stores both so the verbs are
        # real masked updates, not no-ops.
        ("permission", "short"),
        ("leaseHolder", "string"),  # non-null ⇒ under construction
        ("leaseRecoveryTime", "long"),
        # Quota columns (FileProtocol.setQuota verb surface,
        # FileProtocol.java:26-60; the fork leaves FSNamesystem.setQuota
        # as a TODO stub — here they are first-class): -1 ⇒ unset.
        # nsQuota caps namespace items (files+dirs) in the subtree,
        # dsQuota caps total file bytes (HDFS ContentSummary fields).
        ("nsQuota", "long"),
        ("dsQuota", "long"),
    ),
    primary_key=("id",),
    indexes=(
        IndexSpec("PID_NAME", ("parentId", "name"), unique=True),
        IndexSpec("LEASE_HOLDER", ("leaseHolder",)),
    ),
    versioned=True,
)

BLOCK = TableSpec(
    name="block",
    columns=_cols(
        ("id", "long"),
        ("datanodeId", "long"),
        ("length", "long"),  # -1 ⇒ under construction
        ("generationStamp", "long"),
        ("fileId", "long"),
        ("fileIndex", "int"),
    ),
    primary_key=("id", "datanodeId"),
    indexes=(
        IndexSpec("DATANODE_ID", ("datanodeId",)),
        IndexSpec("FILE_ID", ("fileId",)),
    ),
    versioned=True,
)

DATANODE = TableSpec(
    name="datanode",
    columns=_cols(
        ("id", "long"),
        ("name", "string"),
        ("storageId", "string"),
        ("ipcPort", "int"),
        ("infoPort", "int"),
        ("capacity", "long"),
        ("dfsUsed", "long"),
        ("remaining", "long"),
        ("lastUpdated", "long"),
        ("xceiverCount", "int"),
        ("location", "string"),
        ("adminState", "string"),
    ),
    primary_key=("id",),
    indexes=(
        IndexSpec("NAME", ("name",), unique=True),
        IndexSpec("STORAGE_ID", ("storageId",), unique=True),
        IndexSpec("LAST_UPDATED", ("lastUpdated",)),
    ),
    versioned=True,
)

LEASE = TableSpec(
    name="lease",
    columns=_cols(
        ("holder", "string"),
        ("time", "long"),
    ),
    primary_key=("holder",),
    indexes=(IndexSpec("TIME", ("time",)),),
    versioned=True,
)

NN_STATE: dict[str, TableSpec] = {t.name: t for t in (FILE, BLOCK, DATANODE, LEASE)}


def register(spec: TableSpec, registry: dict[str, TableSpec] | None = None) -> TableSpec:
    """Generic spec ingestion: any user table declared the same way joins
    the catalog (parity with DistributedData subclass registration)."""
    (registry if registry is not None else NN_STATE)[spec.name] = spec
    return spec
