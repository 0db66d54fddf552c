"""DSIR hashed n-gram importance resampling (functions/selection.py)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from adfs_spark.functions.selection import (
    bucket_logratio,
    dsir_logweight,
    dsir_select,
    ngram_buckets,
)

DOCS = [
    (0, "tgt", "alpha beta alpha beta alpha beta"),
    (1, "tgt", "alpha beta gamma alpha beta"),
    (2, "raw", "delta epsilon delta epsilon delta"),
    (3, "raw", "epsilon delta zeta zeta zeta"),
    (4, "raw", "alpha beta alpha beta"),  # looks like target
    (5, "raw", "solo"),  # 1 token: its single "gram" is the token itself
]
B = 97  # small bucket count to force collisions through the same math


def _py_bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _py_grams(text: str) -> list[str]:
    t = [x for x in text.split(" ") if x]
    if len(t) <= 1:
        return [" ".join(t)] if t else [""]
    return [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]


def _py_model(target_texts, raw_texts):
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for txt in target_texts:
        for g in _py_grams(txt):
            b = _py_bucket(g)
            tc[b] = tc.get(b, 0) + 1
    for txt in raw_texts:
        for g in _py_grams(txt):
            b = _py_bucket(g)
            rc[b] = rc.get(b, 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    return {
        b: math.log((tc.get(b, 0) + 1.0) / (T + B))
        - math.log((rc.get(b, 0) + 1.0) / (R + B))
        for b in range(B)
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, source: string, text: string")


def test_ngram_buckets_match_python(spark, docs_df):
    got = {
        r["doc_id"]: r["bs"]
        for r in docs_df.select(
            "doc_id", ngram_buckets(F.col("text"), 2, B).alias("bs")
        ).collect()
    }
    for doc_id, _, text in DOCS:
        assert got[doc_id] == [_py_bucket(g) for g in _py_grams(text)]


def test_dsir_logweight_matches_python(spark, docs_df):
    target = docs_df.filter(F.col("source") == "tgt")
    ratio = bucket_logratio(target, docs_df, buckets=B)
    model = _py_model(
        [t for _, s, t in DOCS if s == "tgt"], [t for _, _, t in DOCS]
    )
    got = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweight(docs_df, ratio, buckets=B).collect()
    }
    for doc_id, _, text in DOCS:
        want = sum(model[_py_bucket(g)] for g in _py_grams(text))
        assert got[doc_id] == pytest.approx(want, abs=1e-9)
    # the target-looking raw doc outscores the off-distribution ones
    assert got[4] > got[2] and got[4] > got[3]


def test_ratio_table_is_total(spark, docs_df):
    target = docs_df.filter(F.col("source") == "tgt")
    ratio = bucket_logratio(target, docs_df, buckets=B)
    assert ratio.count() == B  # every bucket present, seen or not


def test_shared_frame_reuse_equals_plain_path(spark, docs_df):
    """ngram_bucket_rows reuse (one persisted explode feeding both
    models and the scoring pass) must be value-identical to the
    plain three-pass construction."""
    from adfs_spark.functions.selection import ngram_bucket_rows

    target = docs_df.filter(F.col("source") == "tgt")
    plain = dsir_logweight(
        docs_df, bucket_logratio(target, docs_df, buckets=B), buckets=B
    )
    rows = ngram_bucket_rows(docs_df, ("doc_id", "source"), "text", buckets=B).persist()
    shared = dsir_logweight(
        docs_df,
        bucket_logratio(
            None,
            None,
            buckets=B,
            target_rows=rows.filter(F.col("source") == "tgt"),
            raw_rows=rows,
        ),
        buckets=B,
        bucket_rows=rows.select("doc_id", "bucket"),
    )
    a = {r["doc_id"]: r["logweight"] for r in plain.collect()}
    b = {r["doc_id"]: r["logweight"] for r in shared.collect()}
    rows.unpersist()
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_dsir_select_deterministic_topk(spark, docs_df):
    target = docs_df.filter(F.col("source") == "tgt")
    ratio = bucket_logratio(target, docs_df, buckets=B)
    a = [r["doc_id"] for r in dsir_select(docs_df, ratio, keep=3, buckets=B).collect()]
    b = [r["doc_id"] for r in dsir_select(docs_df, ratio, keep=3, buckets=B).collect()]
    assert a == b and len(a) == 3
    # near-zero temperature = pure argmax on logweight: target-like docs win
    cold = {
        r["doc_id"]
        for r in dsir_select(
            docs_df, ratio, keep=3, buckets=B, temperature=1e-9
        ).collect()
    }
    w = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweight(docs_df, ratio, buckets=B).collect()
    }
    top3 = set(sorted(w, key=lambda d: (-w[d], d))[:3])
    assert cold == top3
