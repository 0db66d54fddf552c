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


def _file_coverage(spark, path, col):
    """Mean per-file (max-min)/(global range) for ``col`` — the fraction
    of the domain a scan filtered on ``col`` must read per file."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    g = df.agg(F.min(col), F.max(col)).first()
    span = g[1] - g[0]
    per = (
        df.groupBy("_f")
        .agg(((F.max(col) - F.min(col)) / F.lit(span)).alias("cov"))
        .agg(F.avg("cov"))
        .first()[0]
    )
    return per


def test_zorder_skips_on_both_dims(spark, tmp_path):
    from pyspark.sql import functions as F

    from adfs_spark.sources.generic import write_zordered, zorder_value

    # two independent uniform dims: pk-sort can only prune on one
    df = (
        spark.range(40_000)
        .withColumn("x", (F.col("id") * 2654435761) % 100_000)
        .withColumn("y", (F.col("id") * 40503) % 100_000)
    )
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zord")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(flat)
    cuts = write_zordered(df, zord, ("x", "y"), n_files=16, bits=8)

    assert spark.read.parquet(zord).count() == 40_000
    # x-sorted layout: x prunes hard, y not at all
    assert _file_coverage(spark, flat, "x") < 0.15
    assert _file_coverage(spark, flat, "y") > 0.8
    # z-order: BOTH dims substantially narrowed per file
    assert _file_coverage(spark, zord, "x") < 0.5
    assert _file_coverage(spark, zord, "y") < 0.5

    # cutpoints reusable: a later increment stamps onto the same curve
    inc = df.limit(1000)
    zdf, _ = zorder_value(inc, ("x", "y"), bits=8, cutpoints=cuts)
    assert zdf.filter(F.col("_zvalue").isNull()).count() == 0


def test_zorder_value_bounds(spark):
    import pytest as _pytest

    from adfs_spark.sources.generic import zorder_value

    df = spark.range(10).withColumn("x", F_col_double())
    with _pytest.raises(ValueError):
        zorder_value(df, ("x",) * 8, bits=8)


def F_col_double():
    from pyspark.sql import functions as F

    return F.col("id").cast("double")


# -- round 6: JSONL quarantine ingestion ----------------------------------


def test_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.sources.generic import read_jsonl_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "text": "hello"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "lang": "fr", "text": "salut"}\n'
        '{"doc_id": 3, "lang": "de"  broken\n'
        '{"doc_id": 4, "lang": "es", "text": "hola"}\n'
    )
    spec = TableSpec(
        name="j",
        columns=(
            ColumnSpec("doc_id", "long"),
            ColumnSpec("lang", "string"),
            ColumnSpec("text", "string"),
        ),
        primary_key=("doc_id",),
    )
    good, quarantine = read_jsonl_quarantine(spark, spec, str(p))
    assert {r["doc_id"] for r in good.collect()} == {1, 2, 4}
    bad = sorted(r["raw"] for r in quarantine.collect())
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("broken" in b for b in bad)
    good.unpersist()


def test_jsonl_roundtrip_preserves_types(spark, tmp_path):
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.sources.generic import read_jsonl_quarantine, write_jsonl

    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "zh", "x y")],
        "doc_id: long, lang: string, text: string",
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    spec = TableSpec(
        name="j",
        columns=(
            ColumnSpec("doc_id", "long"),
            ColumnSpec("lang", "string"),
            ColumnSpec("text", "string"),
        ),
        primary_key=("doc_id",),
    )
    good, quarantine = read_jsonl_quarantine(spark, spec, out)
    assert quarantine.count() == 0
    assert good.schema["doc_id"].dataType.typeName() == "long"
    assert {tuple(r) for r in good.collect()} == {
        (1, "en", "a b c"), (2, "zh", "x y")}


def test_load_table_schema_cache_identical_reads(spark, tmp_path):
    """r9: load_table caches each fixture's inferred schema per path
    (metadata only — every action still scans the parquet).  The
    schema'd read must be value- and schema-identical to a fresh
    inference read, and the cache must be keyed per path."""
    import os

    from adfs_spark.catalog import _SCHEMA_CACHE, load_table

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", -1.0)], "r_regionkey: int, r_name: string, w: double"
    ).write.parquet(os.path.join(sf, "region.parquet"))
    path = os.path.join(sf, "region.parquet")
    fresh = spark.read.parquet(path)
    first = load_table(spark, sf, "region")
    assert any(k[0] == path for k in _SCHEMA_CACHE)
    again = load_table(spark, sf, "region")  # served from the cache
    assert first.schema == fresh.schema == again.schema
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, fresh.collect()))


def test_load_table_schema_cache_reinfer_on_rewrite(spark, tmp_path):
    """r10 (r9 advice): the schema cache is keyed by (path, mtime, size)
    so a fixture REWRITTEN at the same path in-process re-infers its
    schema instead of being silently read with the stale one (a new
    column would otherwise come back as nulls)."""
    import os
    import shutil
    import time

    from adfs_spark.catalog import load_table

    sf = str(tmp_path)
    path = os.path.join(sf, "region.parquet")
    spark.createDataFrame(
        [(1, "x")], "r_regionkey: int, r_name: string"
    ).write.parquet(path)
    first = load_table(spark, sf, "region")
    assert [f.name for f in first.schema.fields] == ["r_regionkey", "r_name"]
    first.collect()
    # rewrite the fixture at the same path with an extra column
    shutil.rmtree(path)
    time.sleep(0.01)  # ensure a distinct mtime even on coarse clocks
    spark.createDataFrame(
        [(2, "y", 7.5)], "r_regionkey: int, r_name: string, w: double"
    ).write.parquet(path)
    again = load_table(spark, sf, "region")
    assert [f.name for f in again.schema.fields] == ["r_regionkey", "r_name", "w"]
    assert [tuple(r) for r in again.collect()] == [(2, "y", 7.5)]
