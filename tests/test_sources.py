from __future__ import annotations

import pytest

from adfs_spark.schema import ColumnSpec, TableSpec
from adfs_spark.sources.generic import SchemaMismatch, read_table, write_table

SPEC = TableSpec(
    name="t",
    columns=(ColumnSpec("id", "long", nullable=False), ColumnSpec("val", "string")),
    primary_key=("id",),
)


@pytest.fixture()
def data(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id: long, val: string")


def test_roundtrip_parquet(spark, data, tmp_path):
    p = str(tmp_path / "p")
    write_table(data, SPEC, p)
    got = read_table(spark, SPEC, p)
    assert sorted(map(tuple, got.collect())) == [(1, "a"), (2, "b")]


def test_roundtrip_json_csv(spark, data, tmp_path):
    for fmt in ("json", "csv"):
        p = str(tmp_path / fmt)
        data.write.format(fmt).option("header", "true").save(p)
        got = read_table(spark, SPEC, p, fmt=fmt)
        assert sorted(r["id"] for r in got.collect()) == [1, 2]


def test_safe_cast(spark, tmp_path):
    p = str(tmp_path / "cast")
    spark.createDataFrame([(1, "a")], "id: int, val: string").write.parquet(p)
    got = read_table(spark, SPEC, p)
    assert dict(got.dtypes)["id"] == "bigint"


def test_missing_required_column_fails(spark, tmp_path):
    p = str(tmp_path / "missing")
    spark.createDataFrame([("a",)], "val: string").write.parquet(p)
    with pytest.raises(SchemaMismatch):
        read_table(spark, SPEC, p)


def test_extra_column_strict_vs_lax(spark, tmp_path):
    p = str(tmp_path / "extra")
    spark.createDataFrame(
        [(1, "a", 9.0)], "id: long, val: string, junk: double"
    ).write.parquet(p)
    with pytest.raises(SchemaMismatch):
        read_table(spark, SPEC, p)
    got = read_table(spark, SPEC, p, strict=False)
    assert got.columns == ["id", "val"]


def test_partitioned_write(spark, tmp_path):
    import os

    spec = TableSpec(
        name="e",
        columns=(
            ColumnSpec("id", "long", nullable=False),
            ColumnSpec("val", "string"),
            ColumnSpec("part", "string"),
        ),
        primary_key=("id",),
    )
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "id: long, val: string, part: string"
    )
    p = str(tmp_path / "pt")
    write_table(df, spec, p, partition_by=("part",))
    assert {d for d in os.listdir(p) if d.startswith("part=")} == {"part=x", "part=y"}
