"""Persisted inverted text index (operators/search.py): BM25 parity
with a sequential reference, AND/OR semantics, deterministic top-k,
and partition pruning of the postings read."""

from __future__ import annotations

import math
import re

import pytest

from bloomy_etl_spark.operators.search import (
    build_text_index,
    search_text_index,
)

_DOCS = [
    (1, "spark engine shuffles data across the cluster"),
    (2, "duckdb is a fast single node engine"),
    (3, "the spark engine scales the engine surface"),
    (4, "postings lists live in hash buckets"),
    (5, "spark spark spark nothing else"),
]


def _bm25_reference(terms, k1=1.2, b=0.75):
    """Sequential BM25 over _DOCS with whitespace tokens (the same
    model search_text_index implements)."""
    toks = {i: re.split(r"\s+", t) for i, t in _DOCS}
    n = len(_DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, ws in toks.items():
        hits, score = 0, 0.0
        for t in sorted(set(terms)):
            tf = ws.count(t)
            if not tf:
                continue
            hits += 1
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            dl = len(ws)
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        if hits:
            out[i] = (hits, score)
    return out


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("textidx"))
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    build_text_index(df, path, n_buckets=8)
    return path


def test_or_search_matches_reference(spark, index):
    got = {
        r["doc_id"]: (r["n_hits"], r["bm25"])
        for r in search_text_index(
            spark, index, ["spark", "engine"], mode="or", top_k=10
        ).collect()
    }
    ref = _bm25_reference(["spark", "engine"])
    assert set(got) == set(ref)
    for d, (hits, score) in ref.items():
        assert got[d][0] == hits
        assert got[d][1] == pytest.approx(score, rel=1e-9)


def test_and_search_requires_all_terms(spark, index):
    got = [r["doc_id"] for r in search_text_index(
        spark, index, ["spark", "engine"], mode="and", top_k=10).collect()]
    assert set(got) == {1, 3}  # only docs with BOTH terms


def test_top_k_deterministic_order(spark, index):
    ref = _bm25_reference(["spark", "engine"])
    want = sorted(ref, key=lambda d: (-ref[d][1], d))[:2]
    got = [r["doc_id"] for r in search_text_index(
        spark, index, ["spark", "engine"], mode="or", top_k=2).collect()]
    assert got == want


def test_postings_read_is_partition_pruned(spark, index):
    df = search_text_index(spark, index, ["spark"], mode="or", top_k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    frag = plan.split("PartitionFilters")[1].split("]")[0]
    assert "bucket" in frag


def test_validation(spark, index):
    with pytest.raises(ValueError, match="non-empty"):
        search_text_index(spark, index, [])
    with pytest.raises(ValueError, match="mode"):
        search_text_index(spark, index, ["x"], mode="not")
    with pytest.raises(ValueError, match="n_buckets"):
        build_text_index(
            spark.createDataFrame(_DOCS, "doc_id long, text string"),
            "/tmp/never-written", n_buckets=0,
        )


def test_absent_term_and_semantics(spark, index):
    # AND with a term absent from the corpus → empty; OR ignores it
    assert search_text_index(
        spark, index, ["spark", "zzz"], mode="and").count() == 0
    got = {r["doc_id"] for r in search_text_index(
        spark, index, ["spark", "zzz"], mode="or").collect()}
    assert got == {1, 3, 5}
