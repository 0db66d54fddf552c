"""Deterministic sampling / splitting for training-data pipelines.

Random sampling (``df.sample``) is irreproducible across engines and
re-runs with different partitioning; these ops instead derive the
sampling decision from a **content hash of the row key**, which makes
them (a) stable under repartitioning, retries, and engine swaps,
(b) oracle-checkable in plain SQL, and (c) leakage-safe — a document
lands in the same split in every run of every job.

The bucket function is the first 8 hex digits of md5(key) mod 10000
(basis-point granularity).  At 100 TB all of this is a stateless
projection — no shuffle, no driver involvement, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 10000, salt: str = "") -> Column:
    """Deterministic bucket ∈ [0, buckets) from md5 of the key (salted
    so independent experiments draw independent splits)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def split_assign(
    df: DataFrame,
    key_col: str,
    holdout_bp: int = 1000,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to 'train' or 'holdout' (``holdout_bp`` basis
    points, e.g. 1000 = 10%) by key hash."""
    b = hash_bucket(F.col(key_col), 10000, salt)
    return df.withColumn(
        split_col, F.when(b < holdout_bp, F.lit("holdout")).otherwise(F.lit("train"))
    )


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    cap_bp: int,
    salt: str = "",
) -> DataFrame:
    """Downsample to ``cap_bp`` basis points *within every stratum*
    (e.g. per-source caps when mixing corpora).  Hash-based, so the
    kept set is stable and needs no per-stratum counts — one stateless
    filter, no shuffle, unlike window-based reservoir approaches."""
    b = hash_bucket(F.concat(F.col(strata_col), F.lit("|"), F.col(key_col).cast("string")), 10000, salt)
    return df.filter(b < cap_bp)


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str,
    key_col: str,
    default_bp: int = 0,
    salt: str = "",
) -> DataFrame:
    """Corpus mixing: keep a per-stratum fraction (``weights`` maps
    stratum → keep-fraction; strata absent from the map keep
    ``default_bp`` basis points).  Same hash-bucket determinism as
    :func:`stratified_cap` — one stateless filter, reproducible across
    runs/engines, no shuffle.  This is the pretraining-mix primitive
    (e.g. {'wiki': 1.0, 'web': 0.15})."""
    b = hash_bucket(
        F.concat(F.col(strata_col), F.lit("|"), F.col(key_col).cast("string")),
        10000,
        salt,
    )
    thr = F.lit(default_bp)
    for stratum, w in weights.items():
        # round, not truncate: int(0.57 * 10000) == 5699 under binary
        # float — rounding keeps the threshold equal to the requested
        # basis points for every representable weight
        thr = F.when(F.col(strata_col) == stratum, F.lit(round(w * 10000))).otherwise(thr)
    return df.filter(b < thr)
