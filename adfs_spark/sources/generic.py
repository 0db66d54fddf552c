"""Generic spec-validated table IO.

The reference reaches one logical table through three physical
executors (MySQL SQL, HandlerSocket, TDH socket —
DatabaseExecutorForMysqlClient/ForHandlerSocket/ForTdhSocket), all
serving the same ``find`` semantics.  The Spark analog: one logical
:class:`~adfs_spark.schema.TableSpec`, many physical formats — the
reader validates that whatever is on disk conforms to the spec, casting
where safe, failing loudly where not.

``write_table`` lays data out for the read path: partitioned by the
caller's keys, sorted within files by the spec's primary key so parquet
min/max stats act as the "index" (row-group pruning on point finds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adfs_spark.schema import TableSpec

_FORMATS = ("parquet", "json", "csv", "orc")


class SchemaMismatch(Exception):
    pass


def read_table(
    spark: SparkSession,
    spec: TableSpec,
    path: str,
    fmt: str = "parquet",
    strict: bool = True,
    **options,
) -> DataFrame:
    """Read ``path`` as ``spec``'s table.

    - parquet/orc: read natively, then validate + cast column-by-column
      (safe upcasts allowed; missing non-nullable columns are an error).
    - json/csv: read with the spec schema applied directly (schema-on-read).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    target = spec.struct_type()
    if fmt in ("json", "csv"):
        reader = spark.read.schema(target)
        if fmt == "csv":
            options.setdefault("header", "true")
        df = reader.options(**options).format(fmt).load(path)
        return df
    df = spark.read.options(**options).format(fmt).load(path)
    have = {f.name: f.dataType for f in df.schema.fields}
    out_cols = []
    for field in target.fields:
        if field.name not in have:
            if strict and not field.nullable:
                raise SchemaMismatch(f"missing required column: {field.name}")
            out_cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif have[field.name] == field.dataType:
            out_cols.append(F.col(field.name))
        else:
            out_cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
    extra = set(have) - {f.name for f in target.fields}
    if strict and extra:
        raise SchemaMismatch(f"unexpected columns: {sorted(extra)}")
    return df.select(*out_cols)


def write_table(
    df: DataFrame,
    spec: TableSpec,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    target_file_rows: int | None = None,
) -> None:
    """Write laid out for the read path: optional partition columns,
    primary-key sort within files (row-group pruning for point finds),
    optional file sizing via repartition."""
    out = df.select(*[f.name for f in spec.struct_type().fields if f.name in df.columns])
    if target_file_rows:
        n = max(1, df.count() // target_file_rows)
        out = out.repartition(n, *spec.primary_key)
    out = out.sortWithinPartitions(*spec.primary_key)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def zorder_value(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 8,
    cutpoints: dict[str, list[float]] | None = None,
) -> tuple[DataFrame, dict[str, list[float]]]:
    """Append a ``_zvalue`` column: the Morton (z-curve) interleave of
    each column's equi-depth bucket number.

    Per column, ``2**bits`` quantile cutpoints (one driver-side
    ``approxQuantile`` pass — a few KB) map values to bucket ordinals,
    so skewed columns still spread evenly across the curve; the bucket
    bits are then interleaved round-robin into one long.  Everything
    per-row is a codegen'd expression tree (no UDFs, no shuffle).

    Returns ``(df_with_zvalue, cutpoints)`` — pass the cutpoints back in
    to stamp later increments onto the same curve (e.g. compaction of
    new data consistent with the existing layout).
    """
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("need 1 <= n_cols * bits <= 63")
    nb = 1 << bits
    if cutpoints is None:
        probs = [i / nb for i in range(1, nb)]
        cutpoints = {
            c: df.approxQuantile(c, probs, 0.001) for c in cols
        }
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cuts = ",".join(repr(float(v)) for v in cutpoints[c])
        # bucket ordinal = #cutpoints <= value (equi-depth rank)
        # NB: lambda args must not shadow data column names
        bucket = F.expr(
            f"aggregate(array({cuts}), 0L, (_zacc, _zcp) -> _zacc + IF(_zcp <= double({c}), 1L, 0L))"
        )
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(bucket, b).bitwiseAND(F.lit(1).cast("long")),
                    b * len(cols) + i,
                )
            )
    return df.withColumn("_zvalue", z), cutpoints


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: tuple[str, ...],
    n_files: int = 32,
    bits: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, list[float]]:
    """Write ``df`` clustered along a z-curve over ``zorder_cols``.

    ``repartitionByRange`` on the z-value puts curve-adjacent rows in
    the same file, so every file's min/max footprint is narrow in EVERY
    z-ordered dimension — parquet row-group stats then prune scans
    filtered on ANY of the columns, not just a leading sort key.  This
    is the multi-column answer to the reference's per-index B-trees
    (File.java PID_NAME + LEASE_HOLDER + VERSION secondary indexes):
    one layout serving several point/range access paths at once.

    At 100 TB: the quantile pass is one aggregation; the write is one
    range shuffle (same cost as any sorted write); skipping then pays
    on every subsequent scan.  Returns the cutpoints for stamping
    future increments onto the same curve.
    """
    zdf, cuts = zorder_value(df, zorder_cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, "_zvalue")
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )
    return cuts


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a Spark SQL *bucketed* table: rows hash-bucketed on
    ``bucket_cols`` with per-bucket sort, registered in the session
    catalog.  Joins and aggregations between tables bucketed the same
    way on the join key read co-located and skip the shuffle entirely
    (plan-tested: SortMergeJoin with zero Exchange) — at 100 TB this
    turns every repeated fact⋈fact join on the bucket key from a full
    network shuffle into a local merge.  Equal ``num_buckets`` on both
    sides is required for the exchange-free plan."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(name)


def read_jsonl_quarantine(
    spark: SparkSession,
    spec: TableSpec,
    path: str,
    register=None,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with a malformed-record quarantine — the
    shape a web-scale pipeline actually needs: bad records NEVER kill
    the job and NEVER silently vanish; they land in a second frame for
    forensics/replay.

    Returns ``(good, quarantine)``: ``good`` conforms to ``spec``;
    ``quarantine`` is ``(raw string)`` — the verbatim offending line.
    Uses PERMISSIVE mode with ``columnNameOfCorruptRecord`` so parsing
    stays one distributed pass; the frame is persisted before the
    split because Spark disallows filtering on the corrupt-record
    column alone over a raw scan (the parser would have to run twice
    with diverging answers).  At 100 TB the persist is the documented
    cost of exactly-once quarantine semantics.  ``register`` (a
    DataFrame → DataFrame hook, e.g. a persist-and-track helper) lets
    the caller own the cached parent's lifecycle; by default the
    parent is plain ``persist()``-ed and lives until LRU eviction or
    an explicit ``unpersist`` of the shared parent.
    """
    corrupt = "_corrupt_record"
    target = spec.struct_type().add(corrupt, "string")
    df = (
        spark.read.schema(target)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .options(**options)
        .json(path)
    )
    df = register(df) if register is not None else df.persist()
    good = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    quarantine = df.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw")
    )
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
) -> None:
    """JSON-lines export (one object per line, optionally gzipped) —
    the interchange format the training stacks ingest.  Plain
    DataFrameWriter: task-committed, partition-parallel."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
