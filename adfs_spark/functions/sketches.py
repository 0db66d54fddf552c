"""Mergeable sketch summaries: Bloom filters and HyperLogLog.

The 100 TB pattern these serve: a summary you can (a) build in one
distributed pass whose shuffle is sketch-sized, not data-sized, and
(b) MERGE across partitions/days/tables without rescanning — the
pre-aggregation contract every warehouse rollup relies on.

- **Bloom**: built from expressions (k xxhash64 probes → explode →
  ``bit_or`` per 64-bit word), so the build shuffles O(n·k) ints and
  the finished filter is ``num_bits/64`` longs — metadata-sized, safe
  to collect and inline as a literal for map-side probing.  Spark's own
  ``bloom_filter_agg`` is not exposed as a SQL routine (it exists only
  inside runtime join-filter injection), hence the explicit form.
  Guarantee: NO false negatives — a probe of an inserted key is always
  true; false-positive rate ~(1-e^{-kn/m})^k is pytest-bounded.
- **HLL**: Spark 3.5+ ships DataSketches HLL as SQL routines
  (``hll_sketch_agg`` / ``hll_sketch_estimate`` / ``hll_union_agg``);
  wrapped here for per-group approximate distincts and for the
  sketch-union rollup (merge per-partition sketches instead of
  re-scanning rows).

Use case in this engine: Bloom-tier decontamination — when the eval
set's shingle table is too big to broadcast-join exactly
(``dedup.contamination_hits`` broadcasts it), probe a bits-sized Bloom
map-side and only route the flagged minority through the exact join.
The reference has no sketch tier; this extends the LLM-pipeline
surface (SURVEY §2.12 spirit).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- Bloom ----------------------------------------------------------------


def bloom_parameters(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for ``n_items`` at ``fp_rate``:
    m = -n·ln p / ln²2 (rounded up to a word), k = (m/n)·ln 2."""
    n = max(1, n_items)
    m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round((m / n) * math.log(2))))
    return m, k


def _positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions for a key: independent
    xxhash64 streams via distinct integer seeds, mapped into [0, m)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int,
    num_hashes: int,
) -> list[int]:
    """Build a Bloom filter over ``df[col]`` distributedly and return
    it as a ``num_bits/64`` list of longs (the only driver-side data —
    the filter itself, never rows).  One explode of k positions per
    key, one ``bit_or`` groupBy on the word index: shuffle volume is
    O(n·k) small ints with partial aggregation, independent of key
    width."""
    words = (
        df.select(F.explode(_positions(F.col(col), num_bits, num_hashes)).alias("_p"))
        .select(
            (F.col("_p") / 64).cast("long").alias("_w"),
            # shiftleft's amount must be a literal in the Python API;
            # the SQL form takes an expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_m"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["_w"]] = r["_m"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int], col: Column, num_hashes: int
) -> Column:
    """Map-side membership probe against a literal Bloom filter: true
    iff every one of the key's ``num_hashes`` bits is set.  The bitmap
    rides the plan as a literal array (broadcast with the task binary);
    zero shuffles, zero Python."""
    num_bits = len(bitmap) * 64
    words = F.array(*[F.lit(int(w)).cast("long") for w in bitmap])
    pos = _positions(col, num_bits, num_hashes)
    return F.forall(
        pos,
        lambda p: F.getbit(
            F.element_at(words, (p / 64).cast("int") + 1),
            (p % 64).cast("int"),
        )
        == 1,
    )


def bloom_contamination_candidates(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    fp_rate: float = 0.01,
) -> DataFrame:
    """Bloom-tier decontamination pre-filter: flag every document with
    at least one shingle that MIGHT be in the eval set.  Superset of
    the exact ``dedup.contamination_hits`` id set by the no-false-
    negative guarantee (pytest-pinned); the flagged minority is what
    you route through the exact join when the eval shingle table is too
    big to broadcast.  Returns ``(id, n_maybe_hits)``."""
    from adfs_spark.functions.dedup import shingles

    ev = eval_docs.select(
        F.explode(shingles(F.col(text_col), n)).alias("_sh")
    ).distinct()
    n_items = ev.count()
    m, k = bloom_parameters(n_items, fp_rate)
    bitmap = bloom_build(ev, "_sh", m, k)
    per = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("_sh")
    )
    hit = per.filter(bloom_might_contain(bitmap, F.col("_sh"), k))
    return hit.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_maybe_hits"))


# -- HyperLogLog ----------------------------------------------------------


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """Approximate distinct count of ``col`` per group via the
    DataSketches HLL routines — the constant-memory form of
    ``countDistinct`` (exact distinct is a full shuffle of the value
    space; the sketch is 2^lgk bytes per group regardless of
    cardinality)."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_estimate(hll_sketch_agg({col}, {lgk}))").alias(
            "approx_distinct"
        )
    )


def hll_sketch_rollup(
    df: DataFrame,
    part_cols: list[str],
    group_cols: list[str],
    col: str,
    lgk: int = 12,
) -> DataFrame:
    """The mergeable-summary pattern: build one HLL sketch per
    (partition × group) — e.g. per day — then UNION the sketches up to
    the group level without touching rows again.  At 100 TB this is the
    difference between re-scanning a year of data for a distinct-users
    rollup and merging 365 kilobyte-sized sketches."""
    per_part = df.groupBy(*part_cols, *group_cols).agg(
        F.expr(f"hll_sketch_agg({col}, {lgk})").alias("_sk")
    )
    return per_part.groupBy(*group_cols).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(_sk))").alias("approx_distinct")
    )
