"""Data selection: DSIR hashed n-gram importance resampling.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169) scores every raw-corpus
document by how much its hashed n-gram distribution looks like a
TARGET domain versus the raw corpus, then resamples by that weight —
the standard recipe for skewing a 100 TB crawl toward a curated
domain without training a classifier.

Everything here is the Spark-first form of that recipe:

- features are hashed n-gram occurrence counts over ``buckets``
  buckets (the paper uses 10k); the hash is md5-derived so a
  relational oracle can reproduce every bucket id exactly
  (``('0x' || substring(md5(g), 1, 8))::BIGINT % buckets`` — the same
  portable-hash idiom as the split/sample operators);
- the two bag-of-buckets unigram models (target, raw) are ONE
  groupBy each over a map-side explode — at 100 TB both run on
  hash-mod samples (``sample_mod``) because the estimator only needs
  bucket frequencies, and the result is a ``buckets``-row table
  regardless of corpus size;
- the per-document log importance weight
  ``Σ_g count_g(doc) · (log p̂_target[g] − log p̂_raw[g])`` is an
  explode → broadcast-join (the ratio table is ~10k rows) →
  one partial-aggregated shuffle on the document key.  No Python
  anywhere, nothing driver-side but the ratio table's row count.

The reference system has no data-selection tier; this extends the
LLM-pipeline battery (SURVEY §2.8) alongside dedup/decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adfs_spark.functions.text import word_ngrams

DSIR_BUCKETS = 10_000


def ngram_buckets(text: Column, n: int = 2, buckets: int = DSIR_BUCKETS) -> Column:
    """Hashed n-gram features: one md5-derived bucket id in
    ``[0, buckets)`` per n-gram OCCURRENCE (with multiplicity — DSIR
    scores are count-weighted).  Portable: DuckDB reproduces every id
    with ``('0x' || substring(md5(g), 1, 8))::BIGINT % buckets``."""
    return F.transform(
        word_ngrams(text, n),
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % F.lit(buckets),
    )


def ngram_bucket_rows(
    df: DataFrame,
    id_cols: tuple[str, ...],
    text_col: str,
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The exploded (ids…, bucket) occurrence frame every DSIR stage
    consumes.  When the raw model and the scoring pass run over the
    SAME corpus, compute this once and ``persist()`` it — the model
    groupBy and the per-doc sum then share one tokenize+hash+explode
    instead of paying it twice."""
    ids = [F.col(c) for c in id_cols]
    return df.select(
        *ids, F.explode(ngram_buckets(F.col(text_col), n, buckets)).alias("bucket")
    )


def bucket_logratio(
    target: DataFrame | None,
    raw: DataFrame | None,
    text_col: str = "text",
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
    target_rows: DataFrame | None = None,
    raw_rows: DataFrame | None = None,
) -> DataFrame:
    """The ``buckets``-row importance model: for every bucket id,
    ``logratio = log p̂_target − log p̂_raw`` under add-one smoothing
    (``p̂[b] = (count_b + 1) / (total + buckets)``).  Built as a
    ``range(buckets)`` frame left-joined with the two count tables, so
    the result is TOTAL — n-grams never seen in either corpus get the
    constant ``log((R+B)/(T+B))`` rather than silently dropping out of
    a document's score.  Size is ``buckets`` rows whatever the corpus
    size; at 100 TB feed ``target``/``raw`` through a hash-mod sample
    first (frequency estimation needs no full pass).

    ``target_rows``/``raw_rows`` accept a pre-exploded
    :func:`ngram_bucket_rows` frame instead of the raw table — pass a
    persisted one when the scoring pass will walk the same corpus, so
    tokenize+hash+explode runs once."""
    trows = (
        target_rows
        if target_rows is not None
        else ngram_bucket_rows(target, (), text_col, n, buckets)
    )
    rrows = (
        raw_rows
        if raw_rows is not None
        else ngram_bucket_rows(raw, (), text_col, n, buckets)
    )
    tc = trows.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    rc = rrows.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    # grand totals ride a 1-row broadcast cross join; log() of the
    # smoothed frequencies folds into one expression per bucket
    tot = (
        tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("T"))
        .crossJoin(rc.agg(F.coalesce(F.sum("rc"), F.lit(0)).alias("R")))
    )
    base = trows.sparkSession.range(buckets).select(F.col("id").alias("bucket"))
    return (
        base.join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(rc), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1.0) / (F.col("T") + buckets))
                - F.log((F.coalesce(F.col("rc"), F.lit(0)) + 1.0) / (F.col("R") + buckets))
            ).alias("logratio"),
        )
    )


def dsir_logweight(
    df: DataFrame,
    ratio: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
    bucket_rows: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight: explode the doc's
    hashed n-gram occurrences, broadcast-join the ``buckets``-row
    ratio table, sum per document (map-side partial aggregation; the
    only shuffle moves one partial per (task, doc)).  Documents with
    no n-grams (empty/NULL text) score 0.0 — neutral, neither
    up- nor down-weighted.  ``bucket_rows``: a pre-exploded (ids…,
    bucket) frame to reuse (see :func:`ngram_bucket_rows`)."""
    ex = (
        bucket_rows
        if bucket_rows is not None
        else ngram_bucket_rows(df, id_cols, text_col, n, buckets)
    )
    w = (
        ex.join(F.broadcast(ratio), "bucket")
        .groupBy(*id_cols)
        .agg(F.sum("logratio").alias("logweight"))
    )
    return df.join(w, list(id_cols), "left").withColumn(
        "logweight", F.coalesce(F.col("logweight"), F.lit(0.0))
    )


def dsir_select(
    df: DataFrame,
    ratio: DataFrame,
    keep: int,
    id_cols: tuple[str, ...] = ("doc_id",),
    text_col: str = "text",
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
    temperature: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel-top-``keep`` importance resampling (the paper's sampling
    step, made deterministic): each doc draws a reproducible uniform
    from an md5 hash of (seed, id), perturbs ``logweight/temperature``
    with the Gumbel trick, and the global top-``keep`` scores win —
    equivalent to sampling ``keep`` docs without replacement with
    probability ∝ exp(logweight/T).  The top-k itself is Spark's
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Deterministic, so exactly reproducible by an oracle."""
    w = dsir_logweight(df, ratio, id_cols, text_col, n, buckets)
    key = F.concat_ws("|", F.lit(seed), *[F.col(c).cast("string") for c in id_cols])
    u = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") + 1.0) / (
        float(1 << 32) + 2.0
    )
    score = F.col("logweight") / temperature - F.log(-F.log(u))
    return (
        w.withColumn("gumbel_score", score)
        .orderBy(F.desc("gumbel_score"), *[F.col(c) for c in id_cols])
        .limit(keep)
    )
