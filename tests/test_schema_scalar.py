from __future__ import annotations

from pyspark.sql import functions as F

from adfs_spark.functions.scalar import (
    pack_ip_port,
    path_join,
    path_split,
    unpack_ip,
    unpack_port,
    valid_name,
)
from adfs_spark.schema import BLOCK, DATANODE, FILE, LEASE, NN_STATE, TableSpec


def test_schema_registry_specs():
    assert set(NN_STATE) >= {"file", "block", "datanode", "lease"}
    st = FILE.struct_type()
    assert st["version"].dataType.simpleString() == "bigint"
    assert st["length"].dataType.simpleString() == "bigint"
    assert FILE.primary_key == ("id",)
    assert BLOCK.primary_key == ("id", "datanodeId")
    pid_name = [i for i in FILE.indexes if i.name == "PID_NAME"][0]
    assert pid_name.columns == ("parentId", "name") and pid_name.unique


def test_schema_ddl():
    ddl = LEASE.ddl()
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS nn_state.lease")
    assert "holder string" in ddl and "version bigint" in ddl


def test_struct_type_without_version():
    assert "version" not in DATANODE.struct_type(include_version=False).fieldNames()
    assert "version" in DATANODE.struct_type().fieldNames()


def test_path_split_join_roundtrip(spark):
    df = spark.createDataFrame([("/a/b/c",), ("/x",), ("/",)], "p: string")
    parts = df.select(path_split(F.col("p")).alias("parts"))
    got = [r["parts"] for r in parts.collect()]
    assert got == [["a", "b", "c"], ["x"], []]
    joined = df.select(path_join(path_split(F.col("p"))).alias("j")).collect()
    assert [r["j"] for r in joined] == ["/a/b/c", "/x", "/"]


def test_ip_port_packing(spark):
    df = spark.createDataFrame([(3232235777, 50010)], "ip: long, port: long")
    packed = df.select(pack_ip_port(F.col("ip"), F.col("port")).alias("id"))
    row = packed.select(
        unpack_ip(F.col("id")).alias("ip"), unpack_port(F.col("id")).alias("port")
    ).first()
    assert row["ip"] == 3232235777 and row["port"] == 50010


def test_valid_name(spark):
    df = spark.createDataFrame(
        [("ok",), ("",), ("x" * 256,), (None,)], "name: string"
    )
    got = [r[0] for r in df.select(valid_name(F.col("name"))).collect()]
    assert got == [True, False, False, None] or got == [True, False, False, False]
