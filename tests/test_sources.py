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


def test_ingest_native_preserves_values_and_splits(spark, tmp_path):
    import os

    from adfs_spark.catalog import ingest_native, load_table

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "native")
    ingest_native(spark, sf, dest, tables=("nation", "lineitem", "events"))
    # idempotent: marker short-circuits the second call
    ingest_native(spark, sf, dest, tables=("nation", "lineitem", "events"))
    for t in ("nation", "lineitem", "events"):
        src = load_table(spark, sf, t)
        out = load_table(spark, dest, t)
        assert out.schema == src.schema, t
        assert out.count() == src.count(), t
    # sub-megabyte tables stay single-part at sf0.001
    parts = [f for f in os.listdir(os.path.join(dest, "nation.parquet"))
             if f.endswith(".parquet")]
    assert len(parts) == 1
