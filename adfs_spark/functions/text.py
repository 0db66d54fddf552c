"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (split/filter/
aggregate/regexp) — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with executors.  These operators extend the
reference's surface (it has no text processing); they are first-class
citizens of this engine per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adfs_spark.functions.util import bind

# A BPE-ish pre-tokenization: word pieces, numbers, or single
# non-space symbols (the GPT-2 pre-tokenizer family, simplified to a
# regex Spark can run JVM-side).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be",
)


def whitespace_tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings stripped."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def regex_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization (JVM-side regexp_extract_all).

    Operates on the PASSED column (an earlier form routed through
    ``F.expr`` and silently read a column literally named ``text``
    regardless of the argument)."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(whitespace_tokens(text))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    # tokenization let-bound: filter() is a HOF, excluded from codegen
    # subexpression elimination, so an unbound `toks` referenced twice
    # (filter input + size) tokenizes twice — measured 1.45× end-to-end
    # on the ratios battery at sf10 (SCALE.md §14.11)
    def body(toks: Column) -> Column:
        sw = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
        return sw / F.greatest(F.size(toks), F.lit(1))

    return bind(whitespace_tokens(F.lower(text)), body)


# the exact character set of the Java regex class [A-Za-z0-9\s]
# (\s = [ \t\n\x0B\f\r]); deleting it with translate() is a single
# non-regex pass — measured ~40% faster than regexp_replace at sf1
# with bit-identical results.
_ALNUM_WS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 \t\n\x0b\f\r"
)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    stripped = F.translate(text, _ALNUM_WS, "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def mean_word_length(text: Column) -> Column:
    def body(toks: Column) -> Column:
        total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        return total / F.greatest(F.size(toks), F.lit(1))

    return bind(whitespace_tokens(text), body)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic ∈ [0,1]: length band + stopword
    presence + low punctuation + sane word lengths.  The standard
    Gopher/C4-style rule family expressed as one JVM-side expression.
    """
    # one bound pass over the RAW tokens covers the length band and the
    # mean word length (previously 3 separate tokenizations); the
    # stopword piece binds the LOWERED tokens once inside
    # stopword_ratio; punct_ratio is translate()-based, no tokens
    def tok_parts(toks: Column) -> Column:
        n_tok = F.size(toks)
        len_ok = (n_tok >= 10) & (n_tok <= 100000)
        total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        mwl = total / F.greatest(n_tok, F.lit(1))
        return F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0)) + F.when(
            (mwl >= 2) & (mwl <= 12), F.lit(0.2)
        ).otherwise(F.lit(0.0))

    return (
        bind(whitespace_tokens(text), tok_parts)
        + F.when(stopword_ratio(text) > 0.01, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio(text) < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    )


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", appendix A1.1).
# The word-count band, mean-word-length band, and ≥2-required-stopwords
# rule are Gopher's published values; the symbol rule is expressed as a
# punctuation-character fraction (our corpus-portable variant of
# Gopher's #/ellipsis symbol-to-word ratio) and the alpha-word rule is
# Gopher's "80% of words contain an alphabetic character".
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_REQUIRED_STOPWORDS = 2


def gopher_quality_flags(
    text: Column,
    required_stopwords: tuple[str, ...] = GOPHER_REQUIRED_STOPWORDS,
    min_stopwords: int = GOPHER_MIN_REQUIRED_STOPWORDS,
) -> Column:
    """Gopher-style document quality rules as one JVM-side struct.

    Returns a struct of named booleans — ``word_count``,
    ``mean_word_len``, ``symbol_ratio``, ``alpha_words``,
    ``stopwords``, and ``pass_all`` (the conjunction) — true when the
    document PASSES that rule.  This is the standard pre-training
    document filter (Gopher A1.1; the same family C4 and RefinedWeb
    use), expressed as a pure expression tree: one let-bound
    tokenization feeds the word-count / mean-length / alpha-fraction
    rules, one let-bound lowered tokenization feeds the stopword rule,
    and the symbol rule is a single ``translate()`` pass — no Python,
    no shuffle, whole-stage codegen end to end.
    """

    def raw_parts(toks: Column) -> Column:
        n = F.size(toks)
        total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        mwl = total / F.greatest(n, F.lit(1))
        alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
        alpha_frac = alpha / F.greatest(n, F.lit(1))
        return F.struct(
            ((n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)).alias("word_count"),
            (
                (mwl >= GOPHER_MIN_MEAN_WORD_LEN) & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
            ).alias("mean_word_len"),
            (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC).alias("alpha_words"),
        )

    def stop_part(toks: Column) -> Column:
        hits = F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(w) for w in required_stopwords])
            )
        )
        return hits >= min_stopwords

    # every flag coalesces NULL → false: a NULL/absent text FAILS the
    # filter (and the oracle mirror does the same, so the cross-engine
    # unpivot never drops a NULL cell)
    raw = bind(whitespace_tokens(text), raw_parts)
    wc = F.coalesce(raw["word_count"], F.lit(False))
    mwl_ok = F.coalesce(raw["mean_word_len"], F.lit(False))
    alpha_ok = F.coalesce(raw["alpha_words"], F.lit(False))
    stop_ok = F.coalesce(
        bind(whitespace_tokens(F.lower(text)), stop_part), F.lit(False)
    )
    symbol_ok = F.coalesce(punct_ratio(text) <= GOPHER_MAX_SYMBOL_RATIO, F.lit(False))
    return F.struct(
        wc.alias("word_count"),
        mwl_ok.alias("mean_word_len"),
        symbol_ok.alias("symbol_ratio"),
        alpha_ok.alias("alpha_words"),
        stop_ok.alias("stopwords"),
        (wc & mwl_ok & symbol_ok & alpha_ok & stop_ok).alias("pass_all"),
    )


def gopher_rule_failures(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    required_stopwords: tuple[str, ...] = GOPHER_REQUIRED_STOPWORDS,
    min_stopwords: int = GOPHER_MIN_REQUIRED_STOPWORDS,
) -> DataFrame:
    """Per-group rule report: for each quality rule, how many documents
    FAIL it (plus a ``pass_all`` row counting documents passing every
    rule).  One pass over the corpus, one unpivot (``stack`` — map-side),
    one groupBy — two narrow shuffles at any scale, no Python.
    """
    flags = df.select(
        F.col(group_col),
        gopher_quality_flags(
            F.col(text_col), required_stopwords, min_stopwords
        ).alias("_q"),
    )
    rules = ["word_count", "mean_word_len", "symbol_ratio", "alpha_words", "stopwords"]
    stack_expr = "stack({n}, {args}) as (rule, passed)".format(
        n=len(rules) + 1,
        args=", ".join([f"'{r}', _q.{r}" for r in rules] + ["'pass_all', _q.pass_all"]),
    )
    long = flags.select(group_col, F.expr(stack_expr))
    return long.groupBy(group_col, "rule").agg(
        F.sum(F.when(F.col("passed"), 0).otherwise(1)).alias("n_failed"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("n_passed"),
    )


# -- language identification (character n-gram heuristic) ----------------

# Tiny per-language marker profiles: highly characteristic character
# sequences / stopwords. This is the classic n-gram-profile langid
# reduced to a JVM-expressible score; swap profiles freely.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "ing", "tion"),
    "de": ("der", "und", "sch", "ein", "ich"),
    "fr": ("les", "des", "ent", "que", "tion"),
    "es": ("los", "las", "cion", "que", "del"),
    "zh": ("的", "是", "了", "在", "我"),
}


def langid_scores(text: Column) -> Column:
    """Per-language marker-hit scores as a map<string,int>."""
    low = F.lower(text)
    entries = []
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            hits = F.size(F.split(low, F.lit(m), -1)) - 1
            score = hits if score is None else score + hits
        entries.extend([F.lit(lang), score])
    return F.create_map(*entries)


def langid(text: Column) -> Column:
    """Argmax language over the marker profiles ('und' if no hits)."""
    m = langid_scores(text)
    entries = F.map_entries(m)
    best = F.aggregate(
        entries,
        F.struct(F.lit("und").alias("key"), F.lit(0).alias("value")),
        lambda acc, e: F.when(e["value"] > acc["value"], e).otherwise(acc),
    )
    return best["key"]


# -- fingerprinting ------------------------------------------------------


def md5_fingerprint(text: Column) -> Column:
    """Exact-content fingerprint (hex md5) — stable across engines,
    used as the exact-dedup key."""
    return F.md5(text)


def _span_array(toks: Column, window: int) -> Column:
    """``window``-token span strings over a BOUND token array (callers
    must pass a lambda variable or named column, never an inline
    ``split()`` — see :func:`~adfs_spark.functions.util.bind`)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - window + 1, F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, window)))


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min of xxhash64 over
    ``window``-token shingles — robust to small edits, one 64-bit value
    per document. (xxhash64 is Spark-side; for cross-engine comparison
    use md5_fingerprint.)"""
    return bind(
        whitespace_tokens(text),
        lambda toks: F.array_min(
            F.transform(_span_array(toks, window), lambda s: F.xxhash64(s))
        ),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size token windows — the
    context-length chunking step of a training-data pipeline.

    Chunk i covers tokens [i·stride, i·stride + max_tokens) with
    stride = max_tokens − overlap; the final chunk may be short; empty
    documents yield no chunks.  Pure expression tree (tokenize →
    sequence → slice → posexplode): the explode happens map-side, no
    shuffle, no Python — at 100 TB this is a stateless projection
    whose output size is input·(1 + overlap/stride).

    Returns (id, chunk_index, chunk_text, n_tokens).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("require 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def chunks_of(toks: Column) -> Column:
        # number of chunks: ceil(max(n - overlap, 1) / stride) for n > 0
        n_chunks = F.ceil(
            (F.greatest(F.size(toks) - overlap, F.lit(1))) / F.lit(stride)
        )
        starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
        return F.transform(
            starts, lambda i: F.slice(toks, i * stride + 1, max_tokens)
        )

    chunks = bind(whitespace_tokens(F.col(text_col)), chunks_of)
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_index", "_ctoks"),
    ).filter(F.size("_ctoks") > 0)
    return out.select(
        id_col,
        "chunk_index",
        F.concat_ws(" ", "_ctoks").alias("chunk_text"),
        F.size("_ctoks").alias("n_tokens"),
    )


def rolling_fingerprint_md5(text: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint with an engine-portable hash: min of
    md5-hex over ``window``-token shingles.  Same robust-to-small-edits
    property as :func:`rolling_fingerprint`, but md5 is identical in
    every engine, so the result is oracle-checkable (the lexicographic
    min over lowercase hex strings is hash-order equivalent)."""
    return bind(
        whitespace_tokens(text),
        lambda toks: F.array_min(F.transform(_span_array(toks, window), F.md5)),
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """All n-token word n-grams (with multiplicity), as strings."""
    return bind(whitespace_tokens(text), lambda toks: _span_array(toks, n))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models", app. A1.1) per document: ``dup_ngram_frac`` — the
    fraction of n-gram occurrences that are repeats — and
    ``top_ngram_frac`` — the fraction covered by the single most
    frequent n-gram.  (Occurrence fractions, not Gopher's character
    fractions: same signal, simpler cross-engine arithmetic.)

    Distributed shape: explode n-grams → count per (doc, gram) →
    per-doc aggregate.  Two shuffles keyed by (doc, gram) then doc —
    identical to tf·idf; pure expression tree, no Python, no windows.
    """
    g = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_g")
    )
    counts = g.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
    return counts.groupBy(id_col).agg(
        F.sum("_c").alias("n_ngrams"),
        (
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0)))
            / F.sum("_c")
        ).alias("dup_ngram_frac"),
        (F.max("_c") / F.sum("_c")).alias("top_ngram_frac"),
    )


#: (pattern, replacement) masks applied in order.  Patterns stay inside
#: the RE2-compatible subset (no lookaround, no backrefs) so the same
#: regexes run identically on Java regex (Spark) and RE2-family engines
#: (DuckDB, Go) — cross-engine parity is value-checked by the oracle.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{10,}\b", "<LONGNUM>"),
)


def scrub_pii(text: Column) -> Column:
    """Mask common PII shapes (emails, IPv4 addresses, long digit runs)
    with typed placeholder tokens — the standard pre-training scrub
    pass.  A chain of JVM-side ``regexp_replace`` calls: whole-stage
    codegen, no Python, no shuffle; cost is O(bytes scanned)."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_mask_count(scrubbed: Column) -> Column:
    """Number of PII placeholders in an already-scrubbed text."""
    return F.regexp_count(scrubbed, F.lit("<EMAIL>|<IP>|<LONGNUM>"))


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full feature set."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("mean_word_len", mean_word_length(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", langid(t))
        .withColumn("fingerprint", md5_fingerprint(t))
    )


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    idf uses the rational BM25-style form ``(N - df + 0.5)/(df + 0.5)``
    rather than a logarithm: identical ranking behavior, but pure
    IEEE +,-,*,/ arithmetic, so scores are bit-identical across engines
    (ln differs in the last ulp between libms and can flip near-ties).

    Shape: one token explode → repartition by doc id → tf groupBy
    (doc, term) → df groupBy (term) → broadcast scalar N → window
    top-k per doc.  The explicit doc-id repartition makes the token
    table's ONE wide shuffle serve both the (doc,term) aggregation
    (hash on a grouping-key subset satisfies its clustering) and the
    per-doc top-k window, instead of Spark shuffling the token table
    twice; the exchange is reused for the doc-frequency subtree too
    (measured −32% at sf1).  The doc-frequency table is |vocabulary|-
    sized; AQE broadcasts it when small — no forced hint, so a huge
    vocabulary degrades to a shuffle join instead of an OOM.  Ties
    break on term to stay deterministic.
    """
    from pyspark.sql import Window

    # The token exchange must stay POST-explode: both consumer subtrees
    # (tf→scored and tf→dfreq) contain it, and exchange reuse dedups
    # the shuffle write — so the explode is computed once.  Moving the
    # exchange pre-explode was measured 2.3× slower at sf0.1: reuse
    # dedups only the shuffle, and each consumer re-tokenized the
    # corpus above it.  spread() (a no-op at real scale) fixes the one
    # genuine problem with this shape — tokenize+explode of a
    # single-rowgroup file runs as ONE task before the exchange.
    from adfs_spark.functions.util import spread

    toks = spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(whitespace_tokens(F.col(text_col))).alias("term"),
    ).repartition("_id")
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n = df.select(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * ((F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_id").alias(id_col), "term", "score", "rank")
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality score, reduced to its
    simplest deterministic form: train a unigram model on the corpus
    itself (token → count over all documents) and score each document
    by its mean token log-probability ``avg(ln c_tok − ln N)``.
    Low scores flag word-salad / boilerplate outliers exactly like
    CCNet's KenLM perplexity buckets, with no external model artifact.

    Distributed shape: one explode → token-count groupBy (the model),
    one broadcast of the scalar total, one join back to the exploded
    tokens, one per-doc aggregate — two shuffles, all expression-tree.
    At 100 TB the model table is |vocabulary|-sized; for web-scale
    vocabularies feed ``min_count`` to prune the hapax tail before the
    join.
    """
    toks = df.select(
        F.col(id_col), F.explode(whitespace_tokens(F.col(text_col))).alias("_tok")
    )
    model = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        toks.join(model, "_tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(F.log(F.col("_c")) - F.log(F.col("_n"))).alias("avg_logprob"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 lexical relevance (Robertson-Spärck Jones probabilistic
    model, the Okapi BM25 form) of every document against a fixed term
    set — the retrieval primitive next to the ANN tier: decontamination
    lookups, per-domain seed queries, and keyword-driven corpus slicing
    all reduce to it.

    Distributed shape, designed around the query being SMALL (terms
    ride the expression tree, never a join): one scan computes the
    per-document term-frequency vector and length from a single
    let-bound token array (no explode — the |docs|·|tokens| token
    table never materializes); one tiny aggregate reduces it to the
    corpus statistics (N, avgdl, per-term document frequency —
    one row however large the corpus); the scoring pass is the same
    tf vector crossed with the broadcast stats row, entirely
    map-side.  Zero data-row shuffles at any corpus size.  idf is the
    canonical ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — always ≥ 0, so
    stopword-frequency terms degrade to ~0 instead of negative.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")

    def _tf(term: str) -> Column:
        # a dedicated closure per term: a `q=q` default param would
        # make the lambda 2-ary, which F.filter reads as (elem, index)
        return F.size(F.filter(F.col("_t"), lambda x: x == F.lit(term)))

    tf_cols = [_tf(q).alias(f"_tf{i}") for i, q in enumerate(query_terms)]
    # the token array is a named column referenced len(terms)+1 times —
    # CollapseProject cannot re-inline a multiply-referenced non-cheap
    # alias, so tokenization runs once per row (§ SCALE.md 14.11)
    per_doc = df.select(
        F.col(id_col), whitespace_tokens(F.col(text_col)).alias("_t")
    ).select(F.col(id_col), F.size("_t").alias("_dl"), *tf_cols)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    parts = []
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            1.0 + (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        parts.append(idf * (tf * (k1 + 1.0)) / norm)
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    return scored.select(F.col(id_col), total.alias("bm25"))


def extract_domain(url: Column) -> Column:
    """Registrable host from a URL (scheme and path stripped) — the
    key for per-domain corpus policies (blocklists, caps, dedup)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocked_domains: DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose URL host is on the blocklist: one broadcast
    anti-join (blocklists are dimension-sized).  The C4/RefinedWeb
    source-policy stage."""
    d = extract_domain(F.col(url_col)).alias(domain_col)
    keys = F.broadcast(blocked_domains.select(F.col(domain_col)))
    return (
        df.withColumn(domain_col, d)
        .join(keys, domain_col, "left_anti")
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 3,
    names: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    score every document with the corpus unigram LM
    (:func:`unigram_logprob` — the deterministic reduction of CCNet's
    KenLM perplexity) and split EACH LANGUAGE into equal-size quality
    tiers, best-scored first ("head" reads most like the corpus).
    CCNet computes the cutoffs on a sample; ``ntile`` over the full
    partition is the exact form of the same rule.

    Scores are rounded to 5 decimals BEFORE ranking and ties broken by
    id, so tier assignment is reproducible across engines and reruns —
    a boundary document lands in the same tier everywhere.

    Returns ``(id, lang, bucket, lp, n_tokens)``.  Distributed shape:
    the LM costs two shuffles (model groupBy + per-doc aggregate), the
    tiering one sort per language partition.  At 100 TB per-language
    partitions are large but ntile needs only a sort, no state; skewed
    language mixes (web corpora are ~half English) ride the same
    sort-based window as W2 — or sample the cutoffs like CCNet itself
    once exactness stops mattering.
    """
    from pyspark.sql import Window

    s = unigram_logprob(df, id_col, text_col)
    lp = (
        df.select(id_col, lang_col)
        .join(s, id_col)
        .withColumn("lp", F.round("avg_logprob", 5))
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.desc("lp"), F.asc(id_col)
    )
    tiled = lp.withColumn("_tile", F.ntile(n_buckets).over(w))
    name_arr = F.array(*[F.lit(n) for n in names[:n_buckets]])
    return tiled.select(
        id_col,
        lang_col,
        F.element_at(name_arr, F.col("_tile")).alias("bucket"),
        "lp",
        "n_tokens",
    )


def c4_line_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    bad_phrases: tuple[str, ...] = ("lorem ipsum",),
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4's line-level cleaning rules (Raffel et al. 2020, §2.2) as one
    expression tree: a line survives iff it ends in terminal
    punctuation, has at least ``min_words_per_line`` words, and does
    not contain a curly brace or a blocked phrase; a document survives
    iff at least ``min_kept_lines`` lines survive.

    Returns ``(id, n_lines, n_kept_lines, kept_text, doc_kept)`` —
    ``kept_text`` is the document re-joined from its surviving lines.
    Pure built-in HOFs over one let-bound line split: zero shuffles,
    zero Python.  (The synthetic fixture corpus has no newlines or
    sentence punctuation, so this battery is exercised by pytest on
    structured documents rather than by a fixture-vacuous driver row —
    same calibration reasoning as the Gopher stopword list.)
    """
    terminal = "[.!?\u0022\u0027]\\s*$"

    def _line_ok(x: Column) -> Column:
        ends = x.rlike(terminal)
        words = F.size(
            F.filter(F.split(F.trim(x), "\\s+"), lambda t: t != "")
        )
        ok = ends & (words >= min_words_per_line) & ~x.contains("{")
        low = F.lower(x)
        for p in bad_phrases:
            ok = ok & ~low.contains(p)
        return ok

    def _body(ls: Column) -> Column:
        kept = F.filter(ls, _line_ok)
        # let-bind the filtered array too: it feeds three outputs
        return bind(
            kept,
            lambda k: F.struct(
                F.size(ls).alias("n_lines"),
                F.size(k).alias("n_kept_lines"),
                F.array_join(k, "\n").alias("kept_text"),
                (F.size(k) >= min_kept_lines).alias("doc_kept"),
            ),
        )

    stats = bind(F.split(F.col(text_col), "\n"), _body)
    return df.select(
        F.col(id_col),
        stats["n_lines"].alias("n_lines"),
        stats["n_kept_lines"].alias("n_kept_lines"),
        stats["kept_text"].alias("kept_text"),
        stats["doc_kept"].alias("doc_kept"),
    )
