from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adfs_spark.functions.dedup import (
    exact_duplicates,
    drop_exact_duplicates,
    jaccard_pairs,
    minhash_near_duplicates,
    minhash_signatures,
    simhash,
    simhash_near_duplicates,
)
from adfs_spark.functions.text import add_text_features, langid, token_count


def test_chunk_documents(spark):
    import pytest

    from adfs_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),  # shorter than one window
            (3, ""),  # empty → no chunks
        ],
        "doc_id: long, text: string",
    )
    out = chunk_documents(docs, "doc_id", "text", max_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_index"]): r for r in out.collect()}
    # doc 1: stride 3 → starts 0,3,6,9 → ceil((10-1)/3)=3 chunks at 0,3,6
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9" and rows[(1, 2)]["n_tokens"] == 4
    assert rows[(2, 0)]["chunk_text"] == "a b c" and rows[(2, 0)]["n_tokens"] == 3
    assert not any(k[0] == 3 for k in rows)
    # every token of doc 1 appears in some chunk (no gaps)
    covered = set()
    for (d, _), r in rows.items():
        if d == 1:
            covered.update(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(10)}
    with pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", max_tokens=4, overlap=4)


def test_token_count(spark):
    df = spark.createDataFrame([("hello world foo",), ("one",)], "text: string")
    got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    assert got == [3, 1]


def test_langid(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog of the house",),
            ("der hund und ich gehen schnell",),
            ("我 是 的 了 在",),
        ],
        "text: string",
    )
    got = [r[0] for r in df.select(langid(F.col("text"))).collect()]
    assert got == ["en", "de", "zh"]


def test_text_features_on_fixture(tables):
    feats = add_text_features(tables["documents"])
    row = feats.first()
    assert 0.0 <= row["quality"] <= 1.0
    assert row["n_tokens"] > 0
    assert len(row["fingerprint"]) == 32


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id: long, text: string"
    )
    dups = exact_duplicates(df, "id", "text").collect()
    assert len(dups) == 1 and dups[0]["n_dups"] == 2 and dups[0]["keeper"] == 1
    kept = drop_exact_duplicates(df, "id", "text")
    assert sorted(r["id"] for r in kept.collect()) == [1, 3]


def test_jaccard_pairs(spark):
    a = "the quick brown fox jumps over the lazy dog every single day"
    b = "the quick brown fox jumps over the lazy dog every single night"
    c = "completely different words appear here nothing shared at all whatsoever indeed"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "id: long, text: string")
    got = jaccard_pairs(df, "id", "text", n=3, threshold=0.5).collect()
    assert len(got) == 1
    assert (got[0]["id_a"], got[0]["id_b"]) == (1, 2)
    assert 0.5 <= got[0]["jaccard"] < 1.0


def test_minhash_pipeline(spark):
    a = " ".join(f"w{i}" for i in range(50))
    b = " ".join(f"w{i}" for i in range(49)) + " zz"
    c = " ".join(f"x{i}" for i in range(50))
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "id: long, text: string")
    sigs = minhash_signatures(df, "id", "text", num_hashes=32)
    assert len(sigs.first()["signature"]) == 32
    got = minhash_near_duplicates(
        df, "id", "text", num_hashes=32, num_bands=8, threshold=0.5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs == {(1, 2)}


def test_simhash(spark):
    a = " ".join(f"w{i}" for i in range(60))
    b = " ".join(f"w{i}" for i in range(59)) + " zz"
    c = " ".join(f"y{i}" for i in range(60))
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "id: long, text: string")
    sigs = {r["_id"]: r["simhash"] for r in simhash(df, "id", "text").collect()}
    assert len(sigs) == 3
    ham_ab = bin(sigs[1] ^ sigs[2]).count("1")
    ham_ac = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham_ab < ham_ac
    # num_chunks must exceed max_hamming for the pigeonhole guarantee
    got = simhash_near_duplicates(df, "id", "text", max_hamming=15, num_chunks=16).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


def test_hash_split_deterministic_and_proportional(spark):
    from adfs_spark.functions.sampling import split_assign, stratified_cap

    df = spark.range(5000).select(F.col("id").alias("doc_id"),
                                  (F.col("id") % 3).cast("string").alias("source"))
    s1 = split_assign(df, "doc_id", holdout_bp=1000)
    frac = s1.filter(F.col("split") == "holdout").count() / 5000
    assert 0.07 < frac < 0.13  # ~10%
    # stable under repartitioning (the whole point vs df.sample)
    s2 = split_assign(df.repartition(7), "doc_id", holdout_bp=1000)
    assert s1.exceptAll(s2).count() == 0
    # a different salt draws an independent split
    s3 = split_assign(df, "doc_id", holdout_bp=1000, salt="exp2")
    assert s1.exceptAll(s3).count() > 0

    capped = stratified_cap(df, "source", "doc_id", cap_bp=2000)
    per = {r["source"]: r["n"] for r in
           capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for n in per.values():
        assert 0.13 * 5000 / 3 < n < 0.27 * 5000 / 3  # ~20% of each stratum


def test_minhash_exact_collapse_guard(spark):
    """Identical docs (the mega-bucket case) collapse to one
    representative pre-banding and expand back exactly."""
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    far = " ".join(f"q{i}" for i in range(40))
    rows = [(i, base) for i in range(6)] + [(10, near), (11, far)]
    df = spark.createDataFrame(rows, "id: long, text: string")
    got = minhash_near_duplicates(
        df, "id", "text", num_hashes=32, num_bands=8, threshold=0.5
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    # all C(6,2)=15 identical pairs at jaccard 1.0
    ident = {(a, b) for a in range(6) for b in range(a + 1, 6)}
    assert ident <= set(pairs) and all(pairs[p] == 1.0 for p in ident)
    # every member of the identical group pairs with the near doc
    assert {(i, 10) for i in range(6)} <= set(pairs)
    # far doc pairs with nothing
    assert all(11 not in p for p in pairs)
    assert len(pairs) == 15 + 6


def test_connected_components_hand_graph(spark):
    from adfs_spark.functions.dedup import connected_components

    # path 1-2-3-4-5 (exercises pointer jumping), triangle 10-11-12,
    # pair 20-21; nodes without edges are absent by contract
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a: long, id_b: long",
    )
    got = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
            (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}
    assert got == want


def test_repetition_stats_matches_python(spark):
    from collections import Counter

    from adfs_spark.functions.text import repetition_stats

    rows = [
        (1, "a b a b a"),       # grams: "a b","b a","a b","b a" → all dup
        (2, "x y z w"),          # grams all unique
        (3, "q q q q q q"),      # one gram repeated 5x
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    for doc_id, text in rows:
        toks = text.split()
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        c = Counter(grams)
        total = sum(c.values())
        dup = sum(v for v in c.values() if v > 1) / total
        top = max(c.values()) / total
        r = got[doc_id]
        assert r["n_ngrams"] == total
        assert abs(r["dup_ngram_frac"] - dup) < 1e-9
        assert abs(r["top_ngram_frac"] - top) < 1e-9


def test_scrub_pii(spark):
    from adfs_spark.functions.text import pii_mask_count, scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co now"),
            (2, "host 192.168.0.1 and 999.1.2.3"),   # both match the shape mask
            (3, "id 12345678901 but keep 123-456"),
            (4, "clean text, no pii at all"),
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id",
        scrub_pii(F.col("text")).alias("s"),
    ).withColumn("n", pii_mask_count(F.col("s"))).collect()}
    assert out[1]["s"] == "mail <EMAIL> now" and out[1]["n"] == 1
    assert out[2]["s"] == "host <IP> and <IP>" and out[2]["n"] == 2
    assert out[3]["s"] == "id <LONGNUM> but keep 123-456" and out[3]["n"] == 1
    assert out[4]["s"] == "clean text, no pii at all" and out[4]["n"] == 0


def test_decontaminate(spark):
    from adfs_spark.functions.dedup import contamination_hits, decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence with different words"),
            (3, "quick brown fox phrase appears here too"),
        ],
        "doc_id: long, text: string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox ran")], "doc_id: long, text: string"
    )
    hits = {r["doc_id"]: r["n_hits"] for r in contamination_hits(docs, ev, n=3).collect()}
    # docs 1 and 3 share the 3-gram "quick brown fox" with the eval set
    assert set(hits) == {1, 3}
    clean = decontaminate(docs, ev, n=3)
    assert {r["doc_id"] for r in clean.collect()} == {2}


def test_unigram_logprob(spark):
    import math

    from adfs_spark.functions.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id: long, text: string"
    )
    # corpus: a=2, b=1, c=1, N=4
    got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    exp1 = (2 * math.log(2 / 4) + math.log(1 / 4)) / 3
    assert abs(got[1]["avg_logprob"] - exp1) < 1e-12
    assert got[1]["n_tokens"] == 3
    assert abs(got[2]["avg_logprob"] - math.log(1 / 4)) < 1e-12
    # rarer-token doc scores lower
    assert got[2]["avg_logprob"] < got[1]["avg_logprob"]


def test_domain_blocklist_filter(spark):
    from pyspark.sql import functions as F

    from adfs_spark.functions.text import domain_blocklist_filter, extract_domain

    df = spark.createDataFrame(
        [
            (1, "https://bad.example.com/page?q=1"),
            (2, "http://good.example.com:8080/x"),
            (3, "https://good.example.com/y#frag"),
        ],
        "id: long, url: string",
    )
    doms = df.select(extract_domain(F.col("url")).alias("d")).collect()
    assert [r["d"] for r in doms] == [
        "bad.example.com", "good.example.com", "good.example.com",
    ]
    blocked = spark.createDataFrame([("bad.example.com",)], "domain: string")
    kept = domain_blocklist_filter(df, "url", blocked)
    assert {r["id"] for r in kept.collect()} == {2, 3}


def test_repeated_spans_catches_partial_overlap(spark):
    """Span-level dedup must flag a doc that shares only a substring
    with another (doc-level exact/minhash dedup misses this)."""
    from adfs_spark.functions.dedup import repeated_spans

    base = "a b c d e f g h i j k l m n o p"          # 16 tokens
    tail = "i j k l m n o p"                          # its last 8
    other = "q r s t u v w x y z aa bb"               # disjoint
    df = spark.createDataFrame(
        [(1, base), (2, tail), (3, other)], "doc_id: long, text: string"
    )
    out = repeated_spans(df, "doc_id", "text", window=8, min_docs=2).collect()
    # exactly one span (the shared 8-token tail) appears in 2 docs
    assert len(out) == 1
    row = out[0]
    assert row["n_docs"] == 2 and row["n_occurrences"] == 2 and row["keeper"] == 1


def test_repeated_spans_short_docs_truncate(spark):
    from adfs_spark.functions.dedup import repeated_spans

    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x z")], "doc_id: long, text: string"
    )
    out = repeated_spans(df, "doc_id", "text", window=8, min_docs=2).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2  # the truncated "x y" span


def test_repeated_spans_xxhash64_same_groups(spark):
    """The scale fingerprint (xxhash64 long) must produce the SAME
    group structure as the oracle-portable md5 form — fingerprints
    differ, the (n_docs, n_occurrences, keeper) multiset doesn't."""
    from adfs_spark.functions.dedup import repeated_spans

    base = "a b c d e f g h i j k l m n o p"
    tail = "i j k l m n o p"
    df = spark.createDataFrame(
        [(1, base), (2, tail), (3, base), (4, "q r s")],
        "doc_id: long, text: string",
    )
    md5_groups = sorted(
        (r["n_docs"], r["n_occurrences"], r["keeper"])
        for r in repeated_spans(df, "doc_id", "text", window=8).collect()
    )
    xxh = repeated_spans(df, "doc_id", "text", window=8, fingerprint="xxhash64")
    assert dict(xxh.dtypes)["span_fp"] == "bigint"
    xxh_groups = sorted(
        (r["n_docs"], r["n_occurrences"], r["keeper"]) for r in xxh.collect()
    )
    assert md5_groups == xxh_groups

    import pytest as _pytest

    with _pytest.raises(ValueError):
        repeated_spans(df, "doc_id", "text", fingerprint="sha1")


def test_repeated_spans_tokenhash_equals_md5(spark):
    """The O(tokens) rolling form (per-token xxhash64 + Horner fold,
    no span string built) must group identically to the md5-of-text
    form — including order sensitivity ('a b' vs 'b a' spans differ)
    and truncated short-doc spans."""
    from adfs_spark.functions.dedup import repeated_spans

    base = "a b c d e f g h i j k l m n o p"
    rev = "p o n m l k j i h g f e d c b a"  # same tokens, other order
    df = spark.createDataFrame(
        [(1, base), (2, "i j k l m n o p"), (3, base), (4, rev), (5, "q r")],
        "doc_id: long, text: string",
    )
    md5_groups = sorted(
        (r["n_docs"], r["n_occurrences"], r["keeper"])
        for r in repeated_spans(df, "doc_id", "text", window=8, min_docs=1).collect()
    )
    tk = repeated_spans(
        df, "doc_id", "text", window=8, min_docs=1, fingerprint="tokenhash"
    )
    assert dict(tk.dtypes)["span_fp"] == "bigint"
    tk_groups = sorted(
        (r["n_docs"], r["n_occurrences"], r["keeper"]) for r in tk.collect()
    )
    assert md5_groups == tk_groups
    # the reversed doc shares no window-8 span with base
    n_shared = sum(1 for g in tk_groups if g[0] >= 2)
    assert n_shared == len([g for g in md5_groups if g[0] >= 2])


def test_regex_tokens_uses_passed_column(spark):
    """regex_tokens must tokenize the COLUMN IT IS GIVEN — a prior
    form went through F.expr and read the column literally named
    'text' no matter what was passed."""
    from pyspark.sql import functions as F

    from adfs_spark.functions.text import regex_tokens

    df = spark.createDataFrame(
        [("don't panic!", "wrong column")], "body: string, text: string"
    )
    toks = df.select(regex_tokens(F.col("body")).alias("t")).first()["t"]
    assert toks == ["don", "'", "t", "panic", "!"]


@pytest.mark.parametrize("shingle_form", ["string", "tokenhash"])
def test_incremental_minhash_equals_batch_restriction(spark, shingle_form):
    """minhash_dedup_incremental(new, corpus, index) must equal the
    full batch pipeline over corpus ∪ new restricted to pairs touching
    a new doc — same banding ⇒ same candidates; exact verify is
    deterministic.  Fixture plants near-dups in all three shapes:
    corpus↔new, new↔new, corpus↔corpus (the last must NOT appear).
    Parametrized over both shingle hash forms: the index/probe/verify
    contract must hold for the tokenhash rolling form too."""
    from adfs_spark.functions.dedup import (
        minhash_dedup_incremental,
        minhash_index,
        minhash_near_duplicates,
    )

    base = "the quick brown fox jumps over the lazy dog " * 6
    corpus_rows = [
        (1, base + "alpha beta gamma delta"),
        (2, base + "alpha beta gamma delta epsilon"),   # corpus↔corpus near-dup
        (3, "completely different text about other things entirely " * 5),
    ]
    new_rows = [
        (101, base + "alpha beta gamma delta zeta"),    # near-dups corpus 1, 2
        (102, "completely different text about other things entirely " * 5
              + "with a tail"),                         # near-dup corpus 3
        (103, base + "alpha beta gamma delta zeta eta"),  # near-dup 101
        (104, "nothing like anything else here at all honestly " * 5),
    ]
    schema = "doc_id: long, text: string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    new = spark.createDataFrame(new_rows, schema)

    idx = minhash_index(
        corpus, "doc_id", "text", n=3, num_hashes=32, num_bands=8,
        shingle_form=shingle_form,
    )
    inc = minhash_dedup_incremental(
        new, corpus, idx, "doc_id", "text",
        n=3, num_hashes=32, num_bands=8, threshold=0.7,
        shingle_form=shingle_form,
    ).collect()

    full = minhash_near_duplicates(
        corpus.unionByName(new), "doc_id", "text",
        n=3, num_hashes=32, num_bands=8, threshold=0.7, collapse_exact=False,
        shingle_form=shingle_form,
    ).collect()
    new_ids = {101, 102, 103, 104}
    expected = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in full
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in inc}
    assert got == expected
    assert any(a in new_ids and b not in new_ids or b in new_ids and a not in new_ids
               for a, b, _ in got), "no corpus↔new pair found — fixture too weak"
    assert any(a in new_ids and b in new_ids for a, b, _ in got), \
        "no new↔new pair found — fixture too weak"
    assert all(a in new_ids or b in new_ids for a, b, _ in got), \
        "corpus↔corpus pair leaked into the incremental result"


def test_tokenhash_shingles_equal_jaccard(spark):
    """The tokenhash shingle form must produce the SAME exact-Jaccard
    values as the string form: span hashes are a bijection of shingle
    strings (up to 2^-64 collisions), so distinct-set sizes — hence
    every intersection/union ratio — are equal.  Degenerates included:
    short docs (< n tokens), empty text, NULL text, repeated shingles."""
    from adfs_spark.functions.dedup import jaccard_pairs

    rows = [
        (1, "a b c d e f g"),
        (2, "a b c d e f g h"),          # near-dup of 1
        (3, "a b c d e f g"),            # exact dup of 1
        (4, "x y"),                      # shorter than n
        (5, "x y"),                      # dup of the short doc
        (6, ""),                         # empty
        (7, None),                       # NULL
        (8, "a b a b a b a b"),          # repeated shingles
        (9, "q r s t u v w"),            # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    def pairs(form):
        return {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=0.0, shingle_form=form
            ).collect()
        }

    got_s, got_t = pairs("string"), pairs("tokenhash")
    # every pair that shares a shingle in one form shares one in the
    # other, with the identical Jaccard value
    assert got_s == got_t
    assert got_s[(1, 3)] == 1.0 and got_s[(4, 5)] == 1.0
    assert 0.0 < got_s[(1, 2)] < 1.0


def test_bound_token_functions_null_and_empty_text(spark):
    """The bind() let-binding must preserve the pre-bind NULL/empty
    semantics.  Those semantics (pinned here, not designed here): a
    NULL text behaves exactly like an empty text — the span index
    collapses to the single truncated span, whose slice is NULL, and
    concat_ws skips NULLs, so both reduce to the EMPTY-SPAN
    fingerprint; chunking drops empty chunks so neither yields rows."""
    from pyspark.sql import functions as F

    from adfs_spark.functions.dedup import repeated_spans, shingles
    from adfs_spark.functions.text import (
        chunk_documents,
        rolling_fingerprint,
        rolling_fingerprint_md5,
        word_ngrams,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c")], "doc_id: long, text: string"
    )
    row = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            rolling_fingerprint(F.col("text")).alias("fp"),
            rolling_fingerprint_md5(F.col("text")).alias("fpm"),
            F.size(word_ngrams(F.col("text"), 2)).alias("ng"),
            F.size(shingles(F.col("text"), 2)).alias("sh"),
        ).collect()
    }
    # NULL text == empty text: one empty span each, same fingerprint
    assert row[1]["fp"] == row[2]["fp"] and row[1]["fpm"] == row[2]["fpm"]
    assert row[1]["ng"] == 1 and row[2]["ng"] == 1
    assert row[3]["fp"] != row[2]["fp"] and row[3]["ng"] == 2 and row[3]["sh"] == 2

    # the NULL and empty docs therefore GROUP on the empty-span
    # fingerprint in repeated_spans (both hash forms agree)
    for fp in ("md5", "tokenhash"):
        got = repeated_spans(
            df, "doc_id", "text", window=2, min_docs=2, fingerprint=fp
        ).collect()
        assert len(got) == 1 and got[0]["n_docs"] == 2 and got[0]["keeper"] == 1

    # chunking drops empty chunks: no rows for NULL or empty docs
    ch = chunk_documents(df, "doc_id", "text", max_tokens=2)
    assert ch.filter(F.col("doc_id").isin(1, 2)).count() == 0
    assert ch.filter(F.col("doc_id") == 3).count() == 2


# -- Gopher quality rules --------------------------------------------------


def test_gopher_quality_flags_values(spark):
    from adfs_spark.functions.text import gopher_quality_flags

    rows = spark.createDataFrame(
        [
            # 60 words, all alpha, has the/of/and/with, no punct
            (1, " ".join(["the", "of", "and", "with"] * 15)),
            # too short
            (2, "the of and tiny"),
            # no required stopwords
            (3, " ".join(["zebra", "quartz"] * 30)),
            # punctuation-heavy
            (4, " ".join(["the!!!", "of???", "and###"] * 20)),
            (5, None),
            (6, ""),
        ],
        "doc_id: long, text: string",
    ).select("doc_id", gopher_quality_flags(F.col("text")).alias("q"))
    got = {r["doc_id"]: r["q"].asDict() for r in rows.collect()}
    assert got[1]["pass_all"] is True
    assert got[2]["word_count"] is False and got[2]["pass_all"] is False
    assert got[3]["stopwords"] is False
    assert got[4]["symbol_ratio"] is False
    # NULL and empty text fail everything, never NULL out
    for d in (5, 6):
        assert got[d]["pass_all"] is False
        assert all(v is not None for v in got[d].values())


def test_gopher_rule_failures_counts(spark):
    from adfs_spark.functions.text import gopher_rule_failures

    df = spark.createDataFrame(
        [
            ("web", " ".join(["the", "of", "and", "with"] * 15)),
            ("web", "short the of"),
            ("books", None),
        ],
        "source: string, text: string",
    )
    out = {
        (r["source"], r["rule"]): (r["n_failed"], r["n_passed"])
        for r in gopher_rule_failures(df).collect()
    }
    # 6 rules x 2 sources present in the data
    assert len(out) == 12
    assert out[("web", "pass_all")] == (1, 1)
    assert out[("books", "pass_all")] == (1, 0)
    assert out[("web", "word_count")] == (1, 1)


# -- round 6: C4 line rules, CCNet buckets, canonical survivors ----------


def test_c4_line_stats_rules(spark):
    from adfs_spark.functions.text import c4_line_stats

    docs = spark.createDataFrame(
        [
            # 3 good lines, 1 short, 1 braced -> doc kept
            (1, "One two three four five six here.\nshort line\n"
                "Another perfectly fine long sentence!\n"
                "bad { braced long line one two three.\n"
                "Final good sentence with enough words?"),
            # lorem ipsum + unterminated -> everything dropped
            (2, "lorem ipsum dolor sit amet here today.\nno punct line"),
            # exactly at the 3-line keep threshold
            (3, "Aaa bbb ccc ddd eee fff.\nGgg hhh iii jjj kkk.\n"
                "Lll mmm nnn ooo ppp."),
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in c4_line_stats(docs).collect()}
    assert out[1]["n_lines"] == 5 and out[1]["n_kept_lines"] == 3
    assert out[1]["doc_kept"] is True
    assert "{" not in out[1]["kept_text"] and "short" not in out[1]["kept_text"]
    assert out[2]["n_kept_lines"] == 0 and out[2]["doc_kept"] is False
    assert out[2]["kept_text"] == ""
    assert out[3]["n_kept_lines"] == 3 and out[3]["doc_kept"] is True


def test_c4_line_stats_min_words_and_phrases(spark):
    from adfs_spark.functions.text import c4_line_stats

    docs = spark.createDataFrame(
        [(1, "one two three.\nInline Lorem Ipsum mention one two three.")],
        "doc_id: long, text: string",
    )
    r = c4_line_stats(docs, min_words_per_line=3, min_kept_lines=1).collect()[0]
    # first line passes at threshold 3; second blocked by the phrase
    # (case-insensitive match)
    assert r["n_kept_lines"] == 1 and r["kept_text"] == "one two three."


def test_ccnet_buckets_tiling_and_determinism(spark):
    from adfs_spark.functions.text import ccnet_buckets

    # 6 en docs: common words score high, rare words low
    rows = [
        (1, "the the the the", "en"),
        (2, "the the the a", "en"),
        (3, "the a the a", "en"),
        (4, "a rare1 the a", "en"),
        (5, "rare2 rare3 a the", "en"),
        (6, "rare4 rare5 rare6 rare7", "en"),
        (7, "solo words here now", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    out = {r["doc_id"]: r for r in ccnet_buckets(docs).collect()}
    # en: 6 docs -> 2 per tier, ordered by descending logprob
    assert [out[i]["bucket"] for i in (1, 2, 3, 4, 5, 6)] == [
        "head", "head", "middle", "middle", "tail", "tail"]
    # a lone-language doc is its whole head tier
    assert out[7]["bucket"] == "head"
    # deterministic across runs
    again = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(docs).collect()}
    assert again == {k: v["bucket"] for k, v in out.items()}


def test_canonical_survivors_argmax_and_ties(spark):
    from adfs_spark.functions.dedup import canonical_survivors

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a: long, id_b: long"
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (10, 4.0), (11, 4.0),
         (20, 1.0), (21, 8.0), (99, 100.0)],
        "doc_id: long, score: double",
    )
    out = {r["component"]: r for r in canonical_survivors(edges, scores).collect()}
    assert set(out) == {1, 10, 20}  # singleton 99 never appears
    assert out[1]["survivor_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["n_dropped"] == 2
    assert out[10]["survivor_id"] == 10  # score tie -> smallest id
    assert out[20]["survivor_id"] == 21


def test_lsh_spanning_candidates_same_components(spark):
    """End-to-end on real text: spanning-star LSH candidates produce the
    SAME connected components as the all-pairs candidate graph, with at
    most one edge per (doc, band) instead of per-bucket cliques."""
    from adfs_spark.functions.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    far = " ".join(f"q{i}" for i in range(40))
    rows = [(i, base) for i in range(8)] + [(10, near), (11, far)]
    df = spark.createDataFrame(rows, "id: long, text: string")
    sigs = minhash_signatures(df, "id", "text", num_hashes=32).persist()
    allp = lsh_candidate_pairs(sigs, num_bands=8, rows_per_band=4)
    star = lsh_candidate_pairs(sigs, num_bands=8, rows_per_band=4, spanning=True)
    n_all, n_star = allp.count(), star.count()
    # 8 identical docs alone give C(8,2)=28 all-pairs edges; the star
    # caps at one edge per non-hub member per band bucket
    assert n_all >= 28
    assert n_star < n_all
    ca = {(r["node"], r["component"]) for r in connected_components(allp).collect()}
    cs = {(r["node"], r["component"]) for r in connected_components(star).collect()}
    assert ca == cs
    sigs.unpersist()


def test_canonical_survivors_unscored_members(spark):
    """Members missing from the scores frame still count (n_members /
    n_dropped) and never win the argmax; an all-unscored component
    falls back to its smallest id (ADVICE r6: inner join silently
    vanished them)."""
    from adfs_spark.functions.dedup import canonical_survivors

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a: long, id_b: long"
    )
    # node 3 unscored but in the scored component; nodes 10,11 entirely
    # unscored
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0)], "doc_id: long, score: double"
    )
    got = {
        r["component"]: (r["survivor_id"], r["n_members"], r["n_dropped"])
        for r in canonical_survivors(edges, scores).collect()
    }
    assert got == {1: (2, 3, 2), 10: (10, 2, 1)}


def test_minhash_collapse_auto_probe_routes_and_matches(spark):
    """r9: collapse_exact="auto" probes the largest exact-dup family.
    A family past COLLAPSE_EXACT_MAX_FAMILY engages the guard; a clean
    corpus skips its 4 collapse/expansion stages.  Results are
    identical on every route (identical texts share every bucket)."""
    from adfs_spark.functions.dedup import (
        COLLAPSE_EXACT_MAX_FAMILY,
        minhash_near_duplicates,
    )

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    far = " ".join(f"q{i}" for i in range(40))

    # big identical family: auto must produce exactly the guarded
    # result (pairs within the family at 1.0, cross pairs inherited)
    fam = COLLAPSE_EXACT_MAX_FAMILY + 3
    rows = [(i, base) for i in range(fam)] + [(900, near), (901, far)]
    df = spark.createDataFrame(rows, "id: long, text: string")
    kw = dict(num_hashes=32, num_bands=8, threshold=0.5)
    auto = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_near_duplicates(
            df, "id", "text", collapse_exact="auto", **kw
        ).collect()
    }
    forced = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_near_duplicates(
            df, "id", "text", collapse_exact=True, **kw
        ).collect()
    }
    assert auto == forced
    assert auto[(0, 1)] == 1.0 and (0, 900) in auto

    # clean corpus (largest family = 1): auto ≡ no-collapse, and the
    # plan carries no expansion join of the id→rep mapping
    clean = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id: long, text: string"
    )
    a2 = minhash_near_duplicates(clean, "id", "text", collapse_exact="auto", **kw)
    plain = minhash_near_duplicates(clean, "id", "text", collapse_exact=False, **kw)
    ra = {(r["id_a"], r["id_b"]) for r in a2.collect()}
    rp = {(r["id_a"], r["id_b"]) for r in plain.collect()}
    assert ra == rp == {(1, 2)}
    assert "_ra" not in a2._jdf.queryExecution().optimizedPlan().toString()


def test_minhash_collapse_auto_bucket_probe_large_corpus(spark, monkeypatch):
    """r9.2: past PROBE_SMALL_CORPUS_MAX_BYTES the auto route probes the
    largest LSH band bucket from the pipeline's own signature table
    instead of paying a dedicated md5 pass; a mega-bucket escalates to
    the fingerprint probe, which engages the guard only for exact-dup
    families.  Forced here by zeroing the size threshold — results must
    match the small-corpus routes exactly on every branch."""
    from adfs_spark.functions import dedup as D

    monkeypatch.setattr(D, "PROBE_SMALL_CORPUS_MAX_BYTES", 0)

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    far = " ".join(f"q{i}" for i in range(40))
    kw = dict(num_hashes=32, num_bands=8, threshold=0.5)

    # clean corpus: bucket probe finds no mega-bucket → unguarded plan,
    # no md5 fingerprint pass, no expansion join
    clean = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id: long, text: string"
    )
    a = D.minhash_near_duplicates(clean, "id", "text", collapse_exact="auto", **kw)
    got = {(r["id_a"], r["id_b"]) for r in a.collect()}
    assert got == {(1, 2)}
    plan = a._jdf.queryExecution().optimizedPlan().toString()
    assert "_ra" not in plan and "md5" not in plan

    # mega exact-dup family: bucket probe sees the mega-bucket,
    # escalates to the fingerprint probe, guard engages — identical
    # pairs to the forced-guarded run
    fam = D.COLLAPSE_EXACT_MAX_FAMILY + 3
    rows = [(i, base) for i in range(fam)] + [(900, near), (901, far)]
    df = spark.createDataFrame(rows, "id: long, text: string")
    auto = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.minhash_near_duplicates(
            df, "id", "text", collapse_exact="auto", **kw
        ).collect()
    }
    forced = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.minhash_near_duplicates(
            df, "id", "text", collapse_exact=True, **kw
        ).collect()
    }
    assert auto == forced
    assert auto[(0, 1)] == 1.0 and (0, 900) in auto


def test_position_shingles_same_signatures(spark):
    """r9.3: the signature path explodes raw shingle POSITIONS (codegen,
    duplicates kept — harmless under MIN) instead of the distinct-set
    form; signatures must be bit-identical to aggregating over the
    distinct shingle table, for every degenerate shape."""
    from adfs_spark.functions.dedup import (
        _hashed_shingles,
        minhash_signatures,
    )

    rows = [
        (1, "a b c d e f g"),
        (2, "a b a b a b a b"),  # heavy duplicate shingles
        (3, "x"),                # shorter than n
        (4, ""),                 # empty text -> the "" sentinel shingle
        (5, None),               # NULL text -> the "" sentinel, like empty
        (6, "  padded   whitespace  tokens "),
    ]
    df = spark.createDataFrame(rows, "id: long, text: string")
    fast = {
        r["_id"]: r["signature"]
        for r in minhash_signatures(df, "id", "text", 3, 16, 42).collect()
    }
    slow = {
        r["_id"]: r["signature"]
        for r in minhash_signatures(
            df, "id", "text", 3, 16, 42,
            shingle_df=_hashed_shingles(df, "id", "text", 3),
        ).collect()
    }
    assert fast == slow
    # NULL and empty text both reduce to the "" sentinel shingle
    # (concat_ws skips NULLs; greatest(NULL, 1) = 1), in both forms
    assert fast[4] == fast[5]


def test_minhash_inline_shape_equals_shared(spark, monkeypatch):
    """r9.3: past LSH_SHARED_SHINGLE_MAX_BYTES the batch pipeline
    aggregates signatures inline and re-shingles only candidate
    members; forced here by zeroing the gate — pairs and jaccard
    values must match the shared-shingle shape exactly."""
    from adfs_spark.functions import dedup as D

    docs = [(i, " ".join(f"w{i}_{j}" for j in range(30))) for i in range(20)]
    docs += [(100, docs[0][1]), (101, docs[1][1][:-4] + " zz")]
    df = spark.createDataFrame(docs, "id: long, text: string")
    kw = dict(num_hashes=32, num_bands=8, threshold=0.5)

    shared = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.minhash_near_duplicates(
            df, "id", "text", collapse_exact=False, **kw
        ).collect()
    }
    monkeypatch.setattr(D, "LSH_SHARED_SHINGLE_MAX_BYTES", 0)
    inline = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.minhash_near_duplicates(
            df, "id", "text", collapse_exact=False, **kw
        ).collect()
    }
    assert inline == shared and (0, 100) in shared
