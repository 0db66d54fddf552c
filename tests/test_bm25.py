"""Okapi BM25 scoring (text.bm25_scores)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from adfs_spark.functions.text import bm25_scores

CORPUS = [
    (0, "spark shuffle join join join scan"),
    (1, "scan scan scan scan scan scan scan scan scan scan"),
    (2, "merge sort spill"),
    (3, "join scan"),
    (4, "alpha beta gamma delta"),
]
TERMS = ("join", "scan")
K1, B = 1.2, 0.75


def _py_bm25():
    docs = {i: t.split() for i, t in CORPUS}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for q in TERMS:
            tf = toks.count(q)
            df = sum(1 for t in docs.values() if q in t)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * len(toks) / avgdl))
        out[i] = s
    return out


def test_bm25_matches_python(spark):
    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, TERMS).collect()}
    want = _py_bm25()
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-9)
    # no query term at all => exactly zero
    assert got[4] == 0.0
    # tf saturation: ten 'scan's in doc 1 must not beat doc 3's
    # join+scan coverage by a factor of ten (BM25's diminishing tf)
    assert got[1] < 2.5 * got[3]


def test_bm25_length_normalization(spark):
    # identical tf, shorter document ranks higher
    df = spark.createDataFrame(
        [(0, "scan filler " + "pad " * 50), (1, "scan filler")],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ("scan",)).collect()}
    assert got[1] > got[0] > 0.0


def test_bm25_plan_has_no_data_shuffle(spark):
    df = spark.createDataFrame(CORPUS, "doc_id: long, text: string")
    plan = bm25_scores(df, TERMS)._jdf.queryExecution().executedPlan().toString()
    # the only exchanges allowed are the 1-row stats aggregate's and
    # its broadcast; the per-doc side must not shuffle
    import re

    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame([("a", "x y z")], "doc_id: string, text: string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, ())
