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

from pyspark.sql import Column, DataFrame, Window
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


def temperature_weights(
    counts: dict[str, int], temperature: float = 1.0, budget_fraction: float = 1.0
) -> dict[str, float]:
    """Per-source keep-fractions for temperature-based corpus mixing
    (the standard multilingual/multi-source scheme: sampling
    probability ∝ count^(1/T), T > 1 upweights small sources).

    Driver-side planning over per-source *counts* (a handful of
    scalars — get them from one groupBy), returning weights to feed
    :func:`weighted_mix`, which applies them as a stateless
    hash-filter.  ``budget_fraction`` scales the total kept rows to
    that fraction of the corpus; rates cap at 1 and the excess mass is
    iteratively redistributed to uncapped sources (waterfilling), so
    the realized total matches the budget whenever feasible."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if not counts or budget_fraction <= 0:
        return {k: 0.0 for k in counts}
    total = sum(counts.values())
    budget = budget_fraction * total
    probs = {k: c ** (1.0 / temperature) for k, c in counts.items()}
    rates: dict[str, float] = {}
    remaining = dict(probs)
    while remaining:
        z = sum(remaining.values())
        if z == 0:  # no probability mass left (e.g. all-zero counts)
            for k in remaining:
                rates[k] = 0.0
            break
        capped = False
        for k in list(remaining):
            target = budget * remaining[k] / z
            if target >= counts[k]:
                rates[k] = 1.0
                budget -= counts[k]
                del remaining[k]
                capped = True
        if not capped:
            for k, p in remaining.items():
                rates[k] = max(0.0, min(1.0, budget * p / z / counts[k]))
            break
    return rates


_SHUFFLE_BUCKETS = 64


def shuffle_order(
    df: DataFrame, key_col: str, seed: str = "epoch0"
) -> DataFrame:
    """Deterministic global training order: dense rank of every row by
    the md5 of its (salted) key.  Reproducible across engines, re-runs
    and repartitioning — change ``seed`` per epoch for a fresh
    permutation every job of the run agrees on.

    A naive ``row_number().over(Window.orderBy(hash))`` funnels the
    corpus through ONE task; this uses two-pass partition-offset
    numbering instead (the version-stamping scheme): rows range-bucket
    on the hash prefix via driver-side quantile cutpoints (≤64 longs of
    metadata), per-bucket counts become cumulative offsets, and each
    bucket ranks locally — one hash-partitioned exchange, no global
    funnel."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(seed)))
    skn = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    tagged = df.withColumn("_sh", h).withColumn("_skn", skn)
    nb = _SHUFFLE_BUCKETS
    cuts = tagged.approxQuantile("_skn", [i / nb for i in range(1, nb)], 0.001)
    if cuts:
        cut_arr = ",".join(repr(int(v)) + "L" for v in cuts)
        bucket = F.expr(
            f"aggregate(array({cut_arr}), 0L, (_acc, _c) -> _acc + IF(_c <= _skn, 1L, 0L))"
        )
    else:
        # empty input → no quantiles; array() would be typed
        # array<string> and the lambda comparison ill-typed
        bucket = F.lit(0).cast("long")
    tagged = tagged.withColumn("_sb", bucket)
    counts = {
        r["_sb"]: r["count"] for r in tagged.groupBy("_sb").count().collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = (
        F.create_map(*[F.lit(x) for bo in offsets.items() for x in bo])[F.col("_sb")]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_sb").orderBy("_sh", key_col)
    return (
        tagged.withColumn(
            "train_order", (off + F.row_number().over(w)).cast("long")
        )
        .drop("_sh", "_skn", "_sb")
    )
