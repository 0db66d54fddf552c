"""Scalar functions F1-F7 — all JVM-side built-ins, zero Python UDFs.

Each stays inside whole-stage codegen; nothing here forces a Python
round trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_NAME_LENGTH = 255  # FileRepository.java:110-119


def path_split(path: Column) -> Column:
    """F1: path → component array (Utilities.getNamesInPath :1031)."""
    return F.filter(F.split(path, "/"), lambda x: x != F.lit(""))


def path_join(*components: Column) -> Column:
    """F1: components → '/a/b/c' (Utilities.getPathInName :1036)."""
    return F.concat(F.lit("/"), F.concat_ws("/", *components))


def pack_ip_port(ip: Column, port: Column) -> Column:
    """F2: (ip, port) → one long id — (ip << 32) | port, the
    Datanode id packing (Datanode.java:166-172)."""
    return F.shiftleft(ip.cast("long"), 32).bitwiseOR(
        port.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    )


def unpack_ip(packed: Column) -> Column:
    """F2 inverse: id → ip (Datanode.getIp :166-168)."""
    return F.shiftrightunsigned(packed, 32)


def unpack_port(packed: Column) -> Column:
    """F2 inverse: id → port (Datanode.getPort :169-172)."""
    return packed.bitwiseAND(F.lit(0xFFFFFFFF))


def is_dir(length: Column) -> Column:
    """F4: length == -1 ⇒ directory (File.isDir :144-146)."""
    return length == F.lit(-1)


def is_under_construction(lease_holder: Column) -> Column:
    """F4: leaseHolder non-null ⇒ under construction (File.java:148-150)."""
    return lease_holder.isNotNull()


def valid_name(name: Column) -> Column:
    """F5: non-empty, length ≤ 255 (FileRepository.java:110-119,152-157)."""
    return name.isNotNull() & (F.length(name) > 0) & (F.length(name) <= MAX_NAME_LENGTH)


def expired(ts: Column, now_ms: int, limit_ms: int) -> Column:
    """F3/T1/T2: time-threshold predicate — ts < now − limit
    (expiredSoftLimit :889-891, isDatanodeDead :1784-1786)."""
    return ts < F.lit(now_ms - limit_ms)


def counter_add(col: Column, delta: Column) -> Column:
    """F6: TDH UpdateFlag ADD/SUB increment surface (TDHSCommon.java:80-95)."""
    return col + delta
