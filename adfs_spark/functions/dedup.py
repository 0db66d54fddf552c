"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the whole point of these implementations):

- **Exact**: one hash-groupBy on a 128-bit content fingerprint — a
  single shuffle keyed by md5(text); at 100 TB group keys are tiny
  (16 bytes) regardless of document size, so shuffle volume is
  |docs| × 16B, not the corpus.
- **N-gram Jaccard**: explode → self-join on shingle. Quadratic in the
  worst case, so it is the *verify* stage, applied to candidate pairs
  produced by LSH, never the whole corpus (the ``candidates``
  parameter).
- **MinHash+LSH**: shingle → xxhash64 → k permutations ((a·h+b) mod p)
  → band signatures → groupBy band-hash. Only documents sharing a band
  bucket ever meet, so the join is |buckets| sized. This is the scale
  path for near-dedup.
- **SimHash**: 64-bit signature per doc via bit-majority over token
  hashes; hamming-ball lookup by banding the 64 bits into chunks.

Everything is built-in expressions (explode/groupBy/bit ops); no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adfs_spark.functions.text import whitespace_tokens
from adfs_spark.functions.util import bind, spread

# Mersenne prime 2^31-1: universal-hash modulus.  Kept at 31 bits so
# a·h+b (a,h < P) stays below 2^63 — ANSI mode (Spark 4 default)
# raises on long overflow rather than wrapping.
_P = (1 << 31) - 1


def shingles(text: Column, n: int = 3) -> Column:
    """n-token shingles (distinct), as strings.

    Tokenization is let-bound (:func:`~adfs_spark.functions.util.bind`)
    so the per-position lambda references a bound variable — an inlined
    ``split()`` would re-tokenize the document once per shingle
    position (O(tokens²))."""
    return bind(
        whitespace_tokens(text),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    )


def _hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, form: str = "string"
) -> DataFrame:
    """(_id, _h): one row per distinct shingle per document, carrying
    a 64-bit shingle hash instead of its text.  Every consumer
    (signature minimization, Jaccard set intersection) needs only
    equality/hash semantics, so the 8-byte key replaces shingle text
    everywhere downstream — at sf100 the shared persisted shingle table
    drops from ~15 GB of text to ~1 GB of longs, which is what made the
    single-disk spill decade super-linear (SCALE.md §11).  Collisions
    (~|shingles|²/2⁶⁴ per doc pair) are the standard MinHash trade and
    orders of magnitude below the verify threshold's resolution.

    ``form`` picks the hash construction (both yield one long per
    distinct shingle position set; set CARDINALITIES — hence Jaccard
    values — are equal up to 2⁻⁶⁴ collisions, pinned by
    test_tokenhash_shingles_equal_jaccard):

    - ``"string"`` — materialize each shingle as a concat_ws string,
      then xxhash64 it.  O(tokens × n) bytes of transient string per
      doc; the historical form every committed fixture hash was
      measured with.
    - ``"tokenhash"`` — xxhash64 each TOKEN once, then hash-chain the
      n-long window (xxhash64(acc, h), the ``repeated_spans``
      ``tokenhash`` rolling form): no shingle string is ever built, the
      per-span work is n long-ops — the attack on the batch-shingling
      floor that dominates incremental dedup at sf100 (75.1 s of
      88.5 s, r7 verdict ask #7).  Hash VALUES differ from the string
      form (different minhash permutation minima → same-parameter LSH
      recall is statistically identical but not bit-identical), so the
      form must be consistent between an index build and its probes.
    """
    if form == "tokenhash":
        hashed = spread(df).select(
            F.col(id_col).alias("_id"),
            # coalesce NULL (NULL text) to an empty array: one sentinel
            # span per degenerate doc, same shape as the string form's
            # "" shingle (see repeated_spans tokenhash)
            F.coalesce(
                F.transform(
                    whitespace_tokens(F.col(text_col)),
                    lambda t: F.xxhash64(t),
                ),
                F.array().cast("array<bigint>"),
            ).alias("_th"),
        )
        idx = F.sequence(
            F.lit(1), F.greatest(F.size("_th") - n + 1, F.lit(1))
        )
        spans = F.array_distinct(
            F.transform(
                idx,
                lambda i: F.aggregate(
                    F.slice("_th", i, n),
                    F.lit(0).cast("long"),
                    lambda acc, h: F.xxhash64(acc, h),
                ),
            )
        )
        return hashed.select("_id", F.explode(spans).alias("_h"))
    if form != "string":
        raise ValueError(f"shingle form must be string|tokenhash, got {form}")
    return spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), n)).alias("_sh"),
    ).select("_id", F.xxhash64("_sh").alias("_h"))


def _position_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, form: str = "string"
) -> DataFrame:
    """(_id, _h): one row per shingle POSITION — duplicates kept.

    The signature-path twin of :func:`_hashed_shingles`: a MIN
    aggregate is insensitive to duplicate values, so the per-doc
    ``array_distinct`` can be skipped, and once it is, the whole
    explode+hash runs as plain codegen'd expressions — ``explode``
    of a ``sequence`` carrying the token array through the generate,
    then ``concat_ws(slice(_tk, i, n))`` + ``xxhash64`` in the same
    WholeStageCodegen span.  :func:`shingles`' per-position
    ``transform()`` lambda is CodegenFallback (interpreted, one
    GenericArrayData per doc); at sf100 this form cut the signature
    map stage 89.8 → measured-below (see OPTIMIZATION_r09.md).  Hash
    VALUES are identical to the string form — the very same shingle
    strings are built and hashed, only multiplicity differs — so
    MinHash signatures are bit-identical (pinned by
    test_position_shingles_same_signatures).

    NOT for set-semantics consumers (Jaccard sizes/intersections):
    those need the distinct form.
    """
    if form != "string":
        # tokenhash spans chain per-position aggregates (a lambda HOF
        # either way); the distinct form is no slower there
        return _hashed_shingles(df, id_col, text_col, n, form)
    toks = spread(df).select(
        F.col(id_col).alias("_id"),
        whitespace_tokens(F.col(text_col)).alias("_tk"),
    )
    ex = toks.select(
        "_id",
        "_tk",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("_tk") - n + 1, F.lit(1)))
        ).alias("_i"),
    )
    return ex.select(
        "_id",
        F.xxhash64(F.concat_ws(" ", F.slice(F.col("_tk"), F.col("_i"), n))).alias(
            "_h"
        ),
    )


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_docs: int = 2,
    fingerprint: str = "md5",
) -> DataFrame:
    """Substring-level dedup: ``window``-token spans occurring in
    ≥ ``min_docs`` DISTINCT documents (the train-set contamination
    unit of exact-substring dedup à la "Deduplicating Training Data
    Makes Language Models Better" — found there with a suffix array;
    here the fixed-window rolling-fingerprint form, which is the
    shape that distributes).

    Emits (span_fp, n_docs, n_occurrences, keeper) — span_fp is the
    md5 of the span text (engine-portable), keeper the min doc id
    containing it; callers cut every other occurrence.

    Scale shape: one map-side posexplode of per-doc span arrays (no
    shuffle), then ONE groupBy on the fingerprint with partial
    aggregation — shuffle volume is O(total tokens), the intrinsic
    lower bound for substring dedup, and the fingerprint keyspace is
    uniform so there is no skew.  Docs shorter than the window
    contribute their single truncated span.

    ``fingerprint``:

    - ``"md5"`` (default) — hex string of the span TEXT; DuckDB can
      recompute it, so this is the oracle-checked form.
    - ``"xxhash64"`` — 8-byte long of the span text: half the shuffle
      width, but still pays the span-string construction (measured
      only ~2–5 % faster — construction, not hashing, dominates).
    - ``"tokenhash"`` — the O(tokens·window) LONG-ops form: each token
      is hashed to a long ONCE, and a span's fingerprint hash-chains
      its ``window`` token hashes (``acc ← xxhash64(acc, h)``) —
      order-sensitive, no span string is ever built, so the per-span
      work drops from copying ``window`` tokens into a new string to
      ``window`` 2-long hashes.  Same grouping behavior as the text hashes
      (collisions ~|spans|²/2⁶⁴; equality of group profiles vs md5 is
      pinned by ``test_repeated_spans_tokenhash_equals_md5``).  This
      is the 100 TB form — measured 2.0× end-to-end vs md5 at sf1/sf10
      (SCALE.md §14.11).
    """
    if fingerprint not in ("md5", "xxhash64", "tokenhash"):
        raise ValueError(
            f"fingerprint must be md5|xxhash64|tokenhash, got {fingerprint}"
        )
    toks = whitespace_tokens(F.col(text_col))
    if fingerprint == "tokenhash":
        # materialize the per-token hash array as its own column FIRST:
        # referenced by name from the span lambda it is computed once
        # per row, not re-derived per span position (an inlined
        # transform inside the lambda would be)
        # coalesce NULL (NULL text) to an empty array so the NULL-text
        # degenerate grouped with empty text, exactly as the md5 form
        # does (slice(NULL) -> concat_ws "" -> md5 of empty string);
        # without it aggregate(NULL,...) yields a NULL fingerprint and
        # the two degenerates split into different groups
        hashed = df.select(
            F.col(id_col).alias("_id"),
            F.coalesce(
                F.transform(toks, lambda t: F.xxhash64(t)),
                F.array().cast("array<bigint>"),
            ).alias("_th"),
        )
        idx = F.sequence(
            F.lit(1), F.greatest(F.size("_th") - window + 1, F.lit(1))
        )
        spans = F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice("_th", i, window),
                F.lit(0).cast("long"),
                # hash-chain rather than Horner mult-add: ANSI mode
                # (Spark 4 default) raises on long overflow, and
                # xxhash64(acc, h) is order-sensitive with better
                # mixing at the same cost
                lambda acc, h: F.xxhash64(acc, h),
            ),
        )
        per_span = hashed.select("_id", F.explode(spans).alias("span_fp"))
    else:
        # same materialize-first shape: tokenization (a split()) must
        # be a named column when the span lambda references it, or the
        # higher-order transform re-derives it per span position
        fp = F.md5 if fingerprint == "md5" else F.xxhash64
        tok_df = df.select(F.col(id_col).alias("_id"), toks.alias("_tk"))
        idx = F.sequence(
            F.lit(1), F.greatest(F.size("_tk") - window + 1, F.lit(1))
        )
        spans = F.transform(
            idx, lambda i: fp(F.concat_ws(" ", F.slice("_tk", i, window)))
        )
        per_span = tok_df.select("_id", F.explode(spans).alias("span_fp"))
    return (
        per_span.groupBy("span_fp")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("_id").alias("keeper"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


# -- exact ---------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: group by content hash, keep groups with >1 member.
    Returns (fingerprint, n_dups, keeper) — keeper = min id."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per distinct content."""
    w_keep = (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w_keep, id_col, "left_semi")


# -- n-gram Jaccard (exact near-dup verify) ------------------------------


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingle_df: DataFrame | None = None,
    persisted_out: list[DataFrame] | None = None,
    shingle_form: str = "string",
    members_prefiltered: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs.

    Without ``candidates``: all pairs sharing ≥1 shingle (use only on
    bounded inputs).  With ``candidates`` (columns id_a, id_b): verify
    just those pairs — the LSH-then-verify pattern.  ``shingle_df``
    (columns _id, _h — 64-bit shingle hashes, see _hashed_shingles)
    lets callers reuse an already-exploded shingle table
    (minhash_near_duplicates shares one across stages).  Set
    intersection runs on the hashes: 8-byte join keys instead of
    shingle text, same result up to ~2^-64 collisions.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    The candidate path PERSISTS the candidate shingle table (it feeds
    two joins).  One-shot callers can leave the cache to LRU eviction;
    loop callers (a long-running stream) pass ``persisted_out`` to
    collect every frame persisted on their behalf and unpersist after
    materializing the result.
    """
    sh = shingle_df
    if sh is None:
        sh = _hashed_shingles(df, id_col, text_col, n, shingle_form)
    if candidates is not None:
        # Candidate-driven: explode only candidate members and join the
        # pair list first — work is O(|candidates| · shingles/doc), not
        # O(all-pairs-sharing-a-shingle).  This is what makes
        # LSH-then-verify linear at corpus scale.
        # members_prefiltered: the caller vouches df/shingle_df already
        # contains exactly the candidate members (e.g. _lsh_verify's
        # doc-level semi-join ran BEFORE the explode), so the
        # shingle-level semi-join would re-filter an already-filtered
        # table — skipped.
        if members_prefiltered:
            sh_c = sh.persist()
        else:
            docs = candidates.select(F.col("id_a").alias("_id")).union(
                candidates.select(F.col("id_b").alias("_id"))
            ).distinct()
            sh_c = sh.join(docs, "_id", "left_semi").persist()
        if persisted_out is not None:
            persisted_out.append(sh_c)
        sizes = sh_c.groupBy("_id").agg(F.count("*").alias("_sz"))
        sa_sh = sh_c.select(F.col("_id").alias("id_a"), F.col("_h").alias("_sha"))
        sb_sh = sh_c.select(F.col("_id").alias("_idb"), F.col("_h").alias("_shb"))
        common = (
            candidates.join(sa_sh, "id_a")
            .join(
                sb_sh,
                (F.col("id_b") == F.col("_idb")) & (F.col("_sha") == F.col("_shb")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("_common"))
        )
    else:
        sizes = sh.groupBy("_id").agg(F.count("*").alias("_sz"))
        a = sh.alias("a")
        b = sh.alias("b")
        common = (
            a.join(
                b, (F.col("a._h") == F.col("b._h")) & (F.col("a._id") < F.col("b._id"))
            )
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count("*").alias("_common"))
        )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("_common") / (F.col("_sza") + F.col("_szb") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# -- MinHash + LSH -------------------------------------------------------


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_i(x) = (a_i·x + b_i) mod P — seeded, reproducible across runs."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    seed: int = 42,
    shingle_df: DataFrame | None = None,
    shingle_form: str = "string",
) -> DataFrame:
    """Per-document MinHash signature: array<long> of length
    ``num_hashes``.  Shingle → xxhash64 (non-negative via pmod) → min
    over (a·h+b) mod P per hash function.  ``shingle_df`` (columns
    _id, _h) reuses a pre-hashed shingle table; signatures are
    identical either way (same xxhash64 base).

    Shape: explode shingles once, hash once, then ``num_hashes`` cheap
    arithmetic MIN aggregates with map-side partial combine — the
    shuffle carries one row of ``num_hashes`` longs per document
    partial, never the shingles.  (A transform-per-hash-function array
    expression recomputes the shingle array k times — measured 20×
    slower.)"""
    params = _hash_params(num_hashes, seed)
    # the position form keeps duplicate shingles (harmless under MIN)
    # in exchange for a fully codegen'd explode+hash stage
    exploded = (
        shingle_df
        if shingle_df is not None
        else _position_shingle_hashes(df, id_col, text_col, n, shingle_form)
    )
    # _h is the raw 64-bit shingle hash; fold into the universal-hash
    # field exactly as the text path always did (pmod handles the sign)
    exploded = exploded.withColumn("_hm", F.pmod(F.col("_h"), F.lit(_P)))
    # r10: the num_hashes MIN aggregates are built as ONE parsed
    # expression string each instead of 6-7 Column API calls each —
    # the values and the analyzed expressions are identical (pinned by
    # the signature-equality tests), but driver-side plan CONSTRUCTION
    # drops from ~0.7 s to ~0.1 s per invocation at 64 hashes (each
    # Column call is a JVM round trip; the whole pipeline spent ~2 s
    # of its 4.4 s sf0.1 wall-clock building plans, guide §7.3).
    aggs = [
        F.expr(f"min(pmod(_hm * {a}L + {b}L, {_P}L)) AS _m{i}")
        for i, (a, b) in enumerate(params)
    ]
    per_doc = exploded.groupBy("_id").agg(*aggs)
    names = ",".join(f"_m{i}" for i in range(num_hashes))
    return per_doc.select("_id", F.expr(f"array({names}) AS signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_bands: int = 32,
    rows_per_band: int = 4,
    spanning: bool = False,
) -> DataFrame:
    """Band the signatures and emit candidate pairs per bucket.

    Shuffle key = (band index, band hash): only same-bucket documents
    join. Buckets are tiny with high probability, so the per-bucket
    self-join is cheap; skewed mega-buckets (degenerate content) are
    capped by AQE skew-join splitting.
    Returns distinct (id_a, id_b), id_a < id_b.

    ``spanning=True`` emits per-bucket STAR edges (each member → the
    bucket-min id) instead of all intra-bucket pairs: a bucket of f
    members contributes f-1 edges instead of f·(f-1)/2, so the total
    edge count is O(docs × bands) for ANY dup-family size distribution
    — the mode for consumers that only need the candidate graph's
    connectivity (:func:`connected_components`,
    :func:`canonical_survivors`).  The components are provably
    identical to the all-pairs graph's: per bucket, the clique and the
    star span the same node set, and the union over buckets of
    same-span subgraphs has the same transitive closure (pinned by
    test_spanning_equals_allpairs_components).  Not for pipelines that
    exact-verify each candidate pair — a star edge's absence says
    nothing about the pair it skipped.
    """
    banded = _banded(signatures, num_bands, rows_per_band)
    if spanning:
        return _star_edges(banded, ["band", "bucket"], "_id")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def _star_edges(
    grouped: DataFrame, bucket_cols: list, id_col: str
) -> DataFrame:
    """Per-bucket spanning-star edges: (hub=min id in bucket, member).

    One key-partitioned aggregate computes the hub per bucket (map-side
    partial min, so the shuffle carries one row per bucket per mapper),
    then a same-key join attaches it to the members — edges stay
    O(rows), never O(rows²/bucket).  Returns distinct (id_a, id_b),
    id_a < id_b (hub is the bucket min, so id_a is always the hub).
    """
    hubs = grouped.groupBy(*bucket_cols).agg(F.min(id_col).alias("_hub"))
    return (
        grouped.join(hubs, bucket_cols)
        .filter(F.col(id_col) != F.col("_hub"))
        .select(
            F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b")
        )
        .distinct()
    )


def _banded(signatures: DataFrame, num_bands: int, rows_per_band: int) -> DataFrame:
    """(_id, band, bucket) rows — the LSH banding shared by the batch
    pipeline and the materializable incremental index.

    The band loop is unrolled in Python (num_bands is a plan-time
    constant), so the bucket hashes are plain codegen'd expressions —
    multi-arg ``xxhash64`` straight over the signature longs — instead
    of an interpreted ``transform()`` lambda building a comma-joined
    STRING per band per doc (r8 form; at sf100 that tree was ~half the
    candidate stage).  Bucket VALUES differ from the string form, but
    bucket MEMBERSHIP cannot: equal band slices hash equal under any
    deterministic function, so every string-form candidate pair is
    still generated; hash collisions (~|rows|²/2⁶⁴ per band) can only
    ADD candidate pairs, which the exact-Jaccard verify stage filters.
    An on-disk :func:`minhash_index` built before this change must be
    rebuilt (bucket values are not comparable across the two forms).
    """
    # one parsed expression instead of ~6 Column calls per band (r10,
    # construction cost — the parsed tree is identical; see
    # minhash_signatures)
    buckets = ",".join(
        "xxhash64(%s)"
        % ",".join(
            f"signature[{b * rows_per_band + j}]" for j in range(rows_per_band)
        )
        for b in range(num_bands)
    )
    return signatures.select(
        F.col("_id"), F.expr(f"posexplode(array({buckets})) AS (band, bucket)")
    )


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 32,
    seed: int = 42,
    shingle_form: str = "string",
) -> DataFrame:
    """The materializable LSH index of a corpus: (_id, band, bucket)
    rows.  Write it once (e.g. a parquet table partitioned by band);
    each new ingest batch then dedups against the corpus WITHOUT
    re-shingling or re-hashing it — the operational mode at 100 TB,
    where the corpus is three orders of magnitude larger than a batch."""
    sigs = minhash_signatures(
        df, id_col, text_col, n, num_hashes, seed, shingle_form=shingle_form
    )
    return _banded(sigs, num_bands, num_hashes // num_bands)


def minhash_dedup_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_index: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    seed: int = 42,
    persisted_out: list[DataFrame] | None = None,
    phases_out: "dict | None" = None,
    shingle_form: str = "string",
) -> DataFrame:
    """Near-dup pairs INVOLVING a new document: new↔corpus and
    new↔new, against a pre-built :func:`minhash_index`.

    ``phases_out``: pass a dict to machine-record the per-phase cost
    split (batch shingle+band / candidate probe / corpus re-read),
    each phase force-materialized with its row count — instrumentation
    for the bench, NOT the production path (the extra persists/counts
    add barriers a plain run doesn't have; verify-stage time is the
    caller's total minus these).

    Persists the candidate-pair frame (and, via the verify stage, the
    candidate shingle table); loop callers pass ``persisted_out`` to
    unpersist both once the result is materialized.

    Only the new batch is shingled and hashed (O(|batch|)); the corpus
    contributes its stored buckets, and corpus text is re-read only
    for the candidate members the verify stage needs (semi-join at the
    document level, BEFORE any shingle explode).  Ids must be disjoint
    between batch and corpus.  Equal by construction to the batch
    pipeline's result restricted to pairs touching a new doc (same
    banding ⇒ same buckets ⇒ same candidates; exact-Jaccard verify is
    deterministic) — pinned by
    test_incremental_minhash_equals_batch_restriction."""
    import time as _time

    rows_per_band = num_hashes // num_bands
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, n, num_hashes, seed,
        shingle_form=shingle_form,
    )
    new_banded = _banded(new_sigs, num_bands, rows_per_band)
    if phases_out is not None:
        _t = _time.time()
        new_sigs = new_sigs.persist()
        new_banded = new_banded.persist()
        phases_out["batch_shingle_band"] = {
            "rows": new_banded.count(),
            "sec": round(_time.time() - _t, 3),
        }
        if persisted_out is not None:
            persisted_out.extend([new_sigs, new_banded])
    a = new_banded.alias("a")
    c = corpus_index.alias("c")
    new_vs_corpus = (
        a.join(
            c,
            (F.col("a.band") == F.col("c.band"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a._id") != F.col("c._id")),
        )
        .select(
            F.least(F.col("a._id"), F.col("c._id")).alias("id_a"),
            F.greatest(F.col("a._id"), F.col("c._id")).alias("id_b"),
        )
        .distinct()
    )
    new_vs_new = lsh_candidate_pairs(new_sigs, num_bands, rows_per_band)
    cands = new_vs_corpus.unionByName(new_vs_new).distinct().persist()
    if persisted_out is not None:
        persisted_out.append(cands)
    if phases_out is not None:
        _t = _time.time()
        phases_out["candidate_probe"] = {
            "pairs": cands.count(),
            "sec": round(_time.time() - _t, 3),
        }
    needed = cands.select(F.col("id_a").alias(id_col)).union(
        cands.select(F.col("id_b").alias(id_col))
    ).distinct()
    # doc-level semi-join BEFORE the verify shingle explode: only
    # candidate members are ever re-shingled, so corpus re-read cost
    # is O(|candidates|), independent of corpus size
    docs_needed = (
        corpus_docs.select(F.col(id_col), F.col(text_col))
        .unionByName(new_docs.select(F.col(id_col), F.col(text_col)))
        .join(needed, id_col, "left_semi")
    )
    if phases_out is not None:
        _t = _time.time()
        docs_needed = docs_needed.persist()
        phases_out["corpus_reread"] = {
            "docs": docs_needed.count(),
            "sec": round(_time.time() - _t, 3),
        }
        if persisted_out is not None:
            persisted_out.append(docs_needed)
    return jaccard_pairs(
        docs_needed, id_col, text_col, n, threshold, candidates=cands,
        persisted_out=persisted_out, shingle_form=shingle_form,
        members_prefiltered=True,
    )


#: exact-dup family size above which the collapse guard engages on the
#: "auto" route: an f-member byte-identical family lands in ONE bucket
#: of every band, so its self-join pair work is bands · f(f−1)/2 —
#: ≤ ~32k pairs per family at f=64, linear in family count, affordable
#: without collapsing.  Past it the guard's collapse machinery (the
#: mapping join, the representative semi-join, the two expansion
#: joins) pays for itself; below it those 4 stages were measured pure
#: overhead (−2.6 s of the 5.7 s sf0.1 pipeline, where the largest
#: exact family is 2).
COLLAPSE_EXACT_MAX_FAMILY = 64

#: corpus-size (optimizer ``sizeInBytes`` estimate) below which the
#: batch pipeline keeps the r8 shape — ONE shingle explode,
#: hash-partitioned by doc and persisted, shared by the signature and
#: verify stages.  At small scale that table is a few MB and sharing
#: it is pure win (sf0.1: shared 1.97 s vs inline 4.29 s — the inline
#: shape's extra candidate-member jobs dominate sub-second suites).
#: Above the gate the shared table is the problem, not the solution:
#: at sf100 it is 260M rows / ~4 GB shuffled, cached and re-read,
#: while verify only ever touches candidate members (~20% of docs) —
#: the inline shape (signatures aggregated straight off the scan,
#: verify re-shingling only candidate members) measured 61 s warm vs
#: 249 s shared, and 20.4 vs 26.1 s at sf10 (56 MB).  The crossover
#: is bracketed by those runs (0.6 MB: shared wins; 56 MB: inline
#: wins by 22%); 16 MiB splits the bracket, and the error on either
#: side of it is a fraction of a second.
LSH_SHARED_SHINGLE_MAX_BYTES = 16 << 20

#: corpus-size (optimizer ``sizeInBytes`` estimate) below which the
#: "auto" route probes with the md5 fingerprint pass and above which
#: it probes with the signature-bucket aggregate.  Both probes are
#: EXACT — the choice only picks the cheaper one: the md5 pass costs
#: a full text scan + hash (linear in corpus bytes — measured +0.4 s
#: at sf0.1 but +2.0 s at sf10), the bucket probe costs one extra
#: aggregate job over signatures the pipeline builds anyway (~fixed
#: +1.2 s at sf0.1, but amortized to a net −1.0 s at sf10 because the
#: persisted signature table is reused by the candidate stage).
PROBE_SMALL_CORPUS_MAX_BYTES = 1 << 30


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    seed: int = 42,
    collapse_exact: "bool | str" = "auto",
    persisted_out: list[DataFrame] | None = None,
    shingle_form: str = "string",
) -> DataFrame:
    """Full near-dedup pipeline: exact-collapse → MinHash → LSH buckets
    → exact Jaccard verify of candidates.  Returns (id_a, id_b, jaccard).

    ``collapse_exact`` is the mega-bucket guard (SCALE.md §5):
    byte-identical documents — the only unbounded LSH bucket source —
    are collapsed to one representative (min id per md5) *before*
    shingling, and the result is expanded back afterwards: members of
    one group pair with jaccard 1.0; cross-group pairs inherit the
    representatives' jaccard (jaccard is a pure function of content).
    The expansion is exact, so the oracle-checked output is unchanged;
    the quadratic bucket work and the shingle explode now scale with
    |distinct contents|, not |docs|.

    ``"auto"`` (default since r9) PROBES instead of assuming.  The
    probe itself is chosen by corpus size (optimizer ``sizeInBytes``,
    free — no job), because two exact probes exist with opposite cost
    profiles (:data:`PROBE_SMALL_CORPUS_MAX_BYTES`):

    * small corpus — one md5-fingerprint aggregate measures the
      largest exact-dup family directly (a narrow scan, cheap here;
      persisted and reused when the guard engages);
    * large corpus — probe the ACTUAL hazard: the largest LSH band
      bucket, read off the signature table the unguarded pipeline
      builds anyway (a dedicated full-corpus md5 pass was measured
      at ~6% of the whole sf10 pipeline, pure overhead on a clean
      corpus).  An exact-dup family of f members shares every band
      bucket, so max-bucket ≥ f: a max-bucket at or below
      :data:`COLLAPSE_EXACT_MAX_FAMILY` PROVES the per-bucket
      self-join work is bounded and the guard's 4 collapse/expansion
      stages have nothing to bound.  Only a mega-bucket escalates to
      the fingerprint probe, which decides whether byte-identical
      content — the one thing collapse can fix — is the cause (a
      merely *near*-duplicate pile-up also makes big buckets, and
      collapse cannot help it).

    Results are identical on every route: identical texts have
    identical signatures, so they share every band bucket and verify
    at jaccard 1.0 — the guard only ever changed the PLAN.  The
    engage/skip decision is probed, not size-gated, because content
    degeneracy — not corpus bytes — is what makes a bucket explode;
    size only selects which exact probe is cheaper.
    """
    if collapse_exact == "auto":
        from pyspark import StorageLevel

        est_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if est_bytes <= PROBE_SMALL_CORPUS_MAX_BYTES:
            # Small corpus: the md5 fingerprint pass IS the cheaper
            # exact probe here (one narrow scan; the bucket probe's
            # extra aggregate job does not amortize at this size).
            fp0 = df.select(
                F.col(id_col).alias("_mid"), F.md5(F.col(text_col)).alias("_fp")
            ).persist()
            max_family = (
                fp0.groupBy("_fp")
                .agg(F.count("*").alias("_gsz"))
                .agg(F.max("_gsz").alias("m"))
                .first()["m"]
                or 0
            )
            if max_family > COLLAPSE_EXACT_MAX_FAMILY:
                # fp0 stays persisted — the guarded path rebuilds the
                # identical fingerprint subtree and the cache manager
                # substitutes it (plan-equality match).
                if persisted_out is not None:
                    persisted_out.append(fp0)
                return minhash_near_duplicates(
                    df, id_col, text_col, n, num_hashes, num_bands,
                    threshold, seed, collapse_exact=True,
                    persisted_out=persisted_out, shingle_form=shingle_form,
                )
            fp0.unpersist()
            return minhash_near_duplicates(
                df, id_col, text_col, n, num_hashes, num_bands,
                threshold, seed, collapse_exact=False,
                persisted_out=persisted_out, shingle_form=shingle_form,
            )
        rows_per_band = num_hashes // num_bands
        # The bucket probe reads max-bucket off the signature table the
        # unguarded pipeline needs anyway; persisting SIGNATURES (one
        # 64-long row per doc) costs ~2% of the r8 form's full shingle
        # persist and is all the probe and candidate stages share.
        sigs = minhash_signatures(
            df, id_col, text_col, n, num_hashes, seed, shingle_form=shingle_form
        ).persist(StorageLevel.MEMORY_AND_DISK)
        max_bucket = (
            _banded(sigs, num_bands, rows_per_band)
            .groupBy("band", "bucket")
            .count()
            .agg(F.max("count").alias("m"))
            .first()["m"]
            or 0
        )
        if max_bucket > COLLAPSE_EXACT_MAX_FAMILY:
            fp0 = df.select(
                F.col(id_col).alias("_mid"), F.md5(F.col(text_col)).alias("_fp")
            ).persist()
            max_family = (
                fp0.groupBy("_fp")
                .agg(F.count("*").alias("_gsz"))
                .agg(F.max("_gsz").alias("m"))
                .first()["m"]
                or 0
            )
            if max_family > COLLAPSE_EXACT_MAX_FAMILY:
                # The guard engages: drop the unguarded pipeline's
                # cached signatures and recurse with the guard forced
                # on.  fp0 stays persisted — the guarded path rebuilds
                # the identical fingerprint subtree and Spark's cache
                # manager substitutes the cached relation
                # (plan-equality match), so the probe's corpus pass is
                # not repeated.
                sigs.unpersist()
                if persisted_out is not None:
                    persisted_out.append(fp0)
                return minhash_near_duplicates(
                    df, id_col, text_col, n, num_hashes, num_bands,
                    threshold, seed, collapse_exact=True,
                    persisted_out=persisted_out, shingle_form=shingle_form,
                )
            # Mega-bucket without a mega exact-dup family: collapse
            # cannot shrink it; stay unguarded (AQE skew splitting
            # caps the bucket self-join) and keep what we built.
            fp0.unpersist()
        if persisted_out is not None:
            persisted_out.append(sigs)
        cands = lsh_candidate_pairs(sigs, num_bands, rows_per_band).persist()
        if persisted_out is not None:
            persisted_out.append(cands)
        return _lsh_verify(
            df, id_col, text_col, n, threshold, cands,
            persisted_out=persisted_out, shingle_form=shingle_form,
        )
    elif collapse_exact:
        fp = df.select(
            F.col(id_col).alias("_mid"), F.md5(F.col(text_col)).alias("_fp")
        )
        groups = fp.groupBy("_fp").agg(
            F.min("_mid").alias("_rep"), F.count("*").alias("_gsz")
        )
        mapping = fp.join(groups, "_fp").select("_mid", "_rep", "_gsz")
        rep_docs = df.join(
            mapping.filter(F.col("_mid") == F.col("_rep")).select(
                F.col("_rep").alias(id_col)
            ),
            id_col,
            "left_semi",
        )
        core = minhash_near_duplicates(
            rep_docs, id_col, text_col, n, num_hashes, num_bands,
            threshold, seed, collapse_exact=False,
            persisted_out=persisted_out, shingle_form=shingle_form,
        )
        # (rep_a, rep_b, j) pairs, plus each multi-member group with
        # itself at jaccard 1.0; expand through the id→rep mapping.
        rep_pairs = core.select("id_a", "id_b", "jaccard").unionByName(
            groups.filter(F.col("_gsz") > 1).select(
                F.col("_rep").alias("id_a"),
                F.col("_rep").alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        ma = mapping.select(F.col("_rep").alias("_ra"), F.col("_mid").alias("_ia"))
        mb = mapping.select(F.col("_rep").alias("_rb"), F.col("_mid").alias("_ib"))
        # Each member pair arises from exactly one rep pair, and within
        # a group we keep only the _ia < _ib ordering — so the result
        # is duplicate-free by construction (no distinct shuffle).
        return (
            rep_pairs.join(ma, F.col("id_a") == F.col("_ra"))
            .join(mb, F.col("id_b") == F.col("_rb"))
            .filter(
                F.when(F.col("_ra") == F.col("_rb"), F.col("_ia") < F.col("_ib"))
                .otherwise(F.lit(True))
            )
            .select(
                F.least("_ia", "_ib").alias("id_a"),
                F.greatest("_ia", "_ib").alias("id_b"),
                "jaccard",
            )
        )
    rows_per_band = num_hashes // num_bands
    est_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    if est_bytes <= LSH_SHARED_SHINGLE_MAX_BYTES:
        # Small corpus: ONE shingle explode shared by the signature
        # and verify stages, hash-partitioned by document id — the
        # signature groupBy, the size groupBy and the candidate
        # semi-join all require clustering on _id, so one explicit
        # shuffle replaces three downstream exchanges, and the whole
        # table is a few MB so persisting it is free.  The inline
        # shape below costs MORE here: its candidate-member jobs
        # (distinct + semi-join + re-shingle) have fixed overheads
        # that dominate a sub-second pipeline (sf0.1: 4.29 vs 1.97 s).
        from pyspark import StorageLevel

        sh = (
            _hashed_shingles(df, id_col, text_col, n, shingle_form)
            .repartition(F.col("_id"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        if persisted_out is not None:
            persisted_out.append(sh)
        sigs = minhash_signatures(
            df, id_col, text_col, n, num_hashes, seed, shingle_df=sh
        )  # sh carries the form
        # The verify stage reads the candidate set twice (semi-join
        # doc list + the pair join); without a persist the whole
        # signature → banding → bucket-join subtree would execute
        # twice (-30% wall-clock measured at sf0.1).
        cands = lsh_candidate_pairs(sigs, num_bands, rows_per_band).persist()
        if persisted_out is not None:
            persisted_out.append(cands)
        return jaccard_pairs(
            df, id_col, text_col, n, threshold, candidates=cands, shingle_df=sh,
            persisted_out=persisted_out,
        )
    # Large corpus (r9 shape): signatures aggregate INLINE off the doc
    # scan — the shingle explode feeds the 64-min partial aggregate in
    # the same codegen stage, so the exchange carries one 64-long
    # partial row per doc per mapper instead of every shingle row.
    # The shared form above would shuffle and cache O(corpus-shingles)
    # (sf100: 260M rows / ~4 GB) while verify only touches candidate
    # MEMBERS (~20% of docs at sf100); re-shingling just those
    # (doc-level semi-join before the explode, the incremental path's
    # shape) measured 61 s warm vs 249 s shared at sf100.
    sigs = minhash_signatures(
        df, id_col, text_col, n, num_hashes, seed, shingle_form=shingle_form
    )
    # candidates persist: read twice by verify (semi-join doc list +
    # the pair join); without it the whole signature → banding →
    # bucket-join subtree would execute twice.
    cands = lsh_candidate_pairs(sigs, num_bands, rows_per_band).persist()
    if persisted_out is not None:
        persisted_out.append(cands)
    return _lsh_verify(
        df, id_col, text_col, n, threshold, cands,
        persisted_out=persisted_out, shingle_form=shingle_form,
    )


def _lsh_verify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    cands: DataFrame,
    persisted_out: list[DataFrame] | None = None,
    shingle_form: str = "string",
) -> DataFrame:
    """Exact-Jaccard verify of LSH candidate pairs, re-shingling only
    candidate MEMBERS: the doc-level semi-join runs BEFORE the shingle
    explode, so verify cost is O(|candidate docs| · shingles/doc),
    independent of corpus size — the same shape
    :func:`minhash_dedup_incremental` uses for its corpus re-read."""
    needed = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    docs_needed = df.select(F.col(id_col), F.col(text_col)).join(
        needed, id_col, "left_semi"
    )
    return jaccard_pairs(
        docs_needed, id_col, text_col, n, threshold, candidates=cands,
        persisted_out=persisted_out, shingle_form=shingle_form,
        members_prefiltered=True,
    )


def minhash_lsh_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 32,
    seed: int = 42,
) -> dict:
    """Machine-recorded evidence that the LSH banding holds at a given
    scale — the numbers the sf100 analysis (SCALE.md §11) previously
    measured ad hoc:

    - ``max_bucket``: largest (band, bucket) membership after the
      exact-collapse — the quadratic-blowup sentinel;
    - ``bucket_pair_work``: Σ s·(s−1)/2 over buckets — the total
      candidate-join work the banding implies;
    - ``candidates_per_doc``: distinct candidate pairs / docs — the
      per-document verify cost; flat-across-SF means the banding
      scales linearly.

    Mirrors the production pipeline's reduction exactly (exact-collapse
    first, same banding), so the stats describe the plan that actually
    runs.  Bench emits these into BENCH JSON; tools/scale_smoke.py
    asserts candidates_per_doc < 1 at every SF."""
    rep = drop_exact_duplicates(df, id_col, text_col)
    sigs = minhash_signatures(rep, id_col, text_col, n, num_hashes, seed)
    banded = _banded(sigs, num_bands, num_hashes // num_bands)
    bucket_sizes = banded.groupBy("band", "bucket").count()
    agg = bucket_sizes.agg(
        F.max("count").alias("mx"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("work"),
    ).first()
    n_docs = rep.count()
    n_cands = lsh_candidate_pairs(sigs, num_bands, num_hashes // num_bands).count()
    return {
        "n_docs": int(n_docs),
        "max_bucket": int(agg["mx"] or 0),
        "bucket_pair_work": int(agg["work"] or 0),
        "n_candidates": int(n_cands),
        "candidates_per_doc": round(n_cands / max(n_docs, 1), 4),
    }


# -- SimHash -------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``num_bits``-wide SimHash per document: for each bit, majority
    vote of token-hash bits.  Explode tokens → per-(doc,bit) sum of ±1
    → reassemble.  Two shuffles bounded by |docs|·num_bits longs.

    ``hash_fn``: 'xxhash64' (fast, engine-specific, 64 bits) or
    'md5_60' — the top 60 bits of md5, identical in every engine, so a
    DuckDB oracle can recompute the exact signatures (15 hex chars fit
    a signed 64-bit long in both engines)."""
    if hash_fn == "xxhash64":
        h = F.xxhash64("_tok")
        assert num_bits <= 64
    elif hash_fn == "md5_60":
        h = F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast("long")
        assert num_bits <= 60
    else:  # pragma: no cover
        raise ValueError(f"unknown hash_fn {hash_fn}")
    toks = spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(whitespace_tokens(F.col(text_col))).alias("_tok"),
    ).withColumn("_h", h)
    bits = toks.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bits - 1)),
                lambda i: F.when(
                    F.call_function("shiftrightunsigned", F.col("_h"), i).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    1,
                ).otherwise(-1),
            )
        ).alias("_bit", "_vote"),
    )
    votes = bits.groupBy("_id", "_bit").agg(F.sum("_vote").alias("_v"))
    sig = votes.groupBy("_id").agg(
        F.sum(
            F.when(
                F.col("_v") > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), F.col("_bit")),
            ).otherwise(0)
        ).alias("simhash")
    )
    return sig


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    num_chunks: int = 4,
    num_bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split ``num_bits`` bits into ``num_chunks``
    chunks; any pair within distance < num_chunks shares at least one
    exact chunk, so candidate generation is an equi-join on (chunk
    index, chunk value) — never a cross join.  Verify with
    bit_count(xor).
    """
    sigs = simhash(df, id_col, text_col, num_bits=num_bits, hash_fn=hash_fn)
    return hamming_pairs(
        sigs, "_id", "simhash", max_hamming, num_chunks, num_bits
    )


def hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    num_chunks: int = 4,
    num_bits: int = 64,
) -> DataFrame:
    """Pairs of ids whose ``num_bits``-bit signatures differ in ≤
    ``max_hamming`` bits — pigeonhole chunk banding (any pair within
    distance < num_chunks shares one exact chunk) then bit_count(xor)
    verify.  Generic over the signature source: SimHash text
    signatures and perceptual image hashes both route here, so the
    banding math cannot drift between modalities."""
    if num_chunks <= max_hamming:
        raise ValueError(
            f"num_chunks ({num_chunks}) must exceed max_hamming "
            f"({max_hamming}): the pigeonhole recall guarantee needs a "
            "chunk with zero differing bits for every qualifying pair"
        )
    width = num_bits // num_chunks
    chunks = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_chunks - 1)),
            lambda c: F.call_function(
                "shiftrightunsigned", F.col(hash_col), c * width
            ).bitwiseAND(F.lit((1 << width) - 1)),
        )
    )
    banded = sigs.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"),
        chunks.alias("chunk", "value"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("_sa"),
            F.col("b._h").alias("_sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# -- dedup grouping ------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive closure of a near-dup pair graph: (node, component)
    with component = the minimum node id reachable — the pairs→groups
    step every dedup pipeline ends with (keep ``component`` as the
    canonical representative, drop the rest).

    Iterative min-label propagation with pointer jumping: each round
    (1) every node takes the min of its neighbors' labels, then
    (2) every node follows its own label's label (path halving), so
    convergence is O(log n) rounds on chains, not O(diameter).  Each
    round is three key-partitioned shuffles — no row data ever reaches
    the driver; the convergence probe is a distributed ``take(1)``.
    Lineage truncates per round (``localCheckpoint``); on a real
    cluster set ``spark.checkpoint.dir`` and use ``checkpoint`` for
    fault tolerance past executor loss.

    Nodes with no edges are absent (they are their own singleton
    component by definition).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionAll(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)
    for _round in range(max_iter):
        nbr = (
            sym.join(
                labels.select(
                    F.col("node").alias("v"), F.col("component").alias("_nc")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_nc").alias("_m"))
            .select(F.col("u").alias("node"), "_m")
        )
        new = labels.join(nbr, "node", "left").select(
            "node",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("_m"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: follow the label's label
        hop = new.select(
            F.col("node").alias("_k"), F.col("component").alias("_kc")
        )
        new = (
            new.join(hop, new["component"] == hop["_k"], "left")
            .select(
                "node",
                "_old",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_kc"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new.select("node", "component")
        # convergence probe: the pre-round label rides along as ``_old``,
        # so the probe is a bare scan of the just-checkpointed blocks —
        # no join with the previous labels, and round 0 is skipped
        # outright (any edge forces a change in the first round)
        if _round > 0 and not new.filter(
            F.col("component") != F.col("_old")
        ).take(1):
            break
    return labels


# -- decontamination -----------------------------------------------------


def contamination_hits(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Test-set decontamination, stage 1: per training document, how
    many distinct n-gram shingles it shares with the evaluation corpus
    — the standard overlap check every LLM data pipeline runs before
    training (eval n-grams leaking into train data inflate benchmarks).

    Shape at 100 TB: the eval side is tiny (benchmarks are KBs-MBs), so
    its distinct shingle set broadcasts; the train side explodes
    shingles map-side and the hit count is one groupBy on ``id_col``.
    No shuffle ever carries the corpus text itself.
    """
    ev = (
        eval_docs.select(F.explode(shingles(F.col(text_col), n)).alias("_s"))
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("_s")
    )
    return (
        doc_sh.join(ev, "_s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hits: int = 0,
) -> DataFrame:
    """Drop training documents sharing more than ``max_hits`` distinct
    n-grams with the eval corpus (stage 2 of decontamination: one
    anti-join against the flagged id set)."""
    hits = contamination_hits(docs, eval_docs, id_col, text_col, n)
    flagged = hits.filter(F.col("n_hits") > max_hits).select(id_col)
    return docs.join(flagged, id_col, "left_anti")


def canonical_survivors(
    edges: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """The step a dedup pipeline actually ships: collapse the near-dup
    pair graph into clusters and pick ONE canonical survivor per
    cluster — the member with the highest ``score_col`` (ties broken
    toward the smallest id, so reruns are stable).  Everything else in
    the cluster is the drop set.

    Returns ``(component, survivor_id, n_members, n_dropped)`` for
    every multi-member component; singleton documents never enter the
    edge list and are survivors by definition (same convention as
    :func:`connected_components`).

    ``scores`` need not cover every edge endpoint: unscored members
    still count toward ``n_members`` and can still be dropped, they
    just never win the argmax (their score coalesces to -inf; a
    component whose members are ALL unscored falls back to the
    smallest id).  An inner join here would silently drop such members
    from the counts and could crown the wrong survivor.

    Distributed shape: the component labels come from pointer-jumping
    (O(log n) rounds), then ONE key-partitioned shuffle on component
    with ``max_by(node, (score, -node))`` doing the argmax inside the
    aggregate — no window, no second pass over the scores.  At corpus
    scale components are tiny (near-dup clusters), so the aggregate is
    skew-free by construction.
    """
    comp = connected_components(edges, src=src, dst=dst)
    sc = scores.select(
        F.col(id_col).alias("node"), F.col(score_col).alias("_score")
    )
    j = comp.join(sc, "node", "left").withColumn(
        "_score",
        F.coalesce(F.col("_score").cast("double"), F.lit(float("-inf"))),
    )
    return j.groupBy("component").agg(
        F.expr(
            "max_by(node, struct(_score, -node))"
        ).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_members"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
    )
