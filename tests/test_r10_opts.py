"""Round-10 optimization pins: each test freezes the plan/result property
an r10 optimization introduced, so a regression that silently undoes the
optimization (or changes what a query computes) fails loudly.

Covered here:
* q133 first_seen_novelty — gram-keyed exchange keys on int64 xxhash64
  fingerprints, not ~20-byte gram strings (guide §2.3), with results
  identical to the brute-force definition;
* (basket_pairs max_basket guard pins live beside the r9 basket_pairs
  suite in test_r9b_operators.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestKeepBestAggregateShape:
    def test_no_window_in_plan(self, spark):
        """r10: keep_best_per_cluster's per-cluster arg-max is ONE
        map-side-combinable hash-agg (max(struct(quality, -id))), not a
        window — no Window node, no Sort feeding it, and a partial
        aggregate below the label exchange."""
        from bloomy_etl_spark.operators.dedup import keep_best_per_cluster

        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "node long, label long"
        )
        docs = spark.createDataFrame(
            [(1, 100), (2, 250), (3, 400)], "doc_id long, n_chars long"
        )
        p = _plan(keep_best_per_cluster(labels, docs, "n_chars"))
        assert "Window" not in p
        # max(struct) carries a struct agg buffer, so Spark plans a
        # SortAggregate — crucially with a PARTIAL aggregate below the
        # label exchange (map-side combine), which is the optimization:
        # the shuffle carries one partial row per (label, partition),
        # not every cluster member.
        assert "SortAggregate" in p
        import re

        agg_lines = [ln for ln in p.splitlines()
                     if re.match(r"^\(\d+\) SortAggregate", ln)]
        assert len(agg_lines) >= 2  # partial + final


class TestQ133GramFingerprints:
    def test_gram_exchange_keys_int64(self, spark):
        """The novelty gram key must be the xxhash64 fingerprint: no
        gram STRING may survive into any exchange (the optimization is
        the narrower shuffle key; an accidental revert re-widens it)."""
        from bloomy_etl_spark.operators.corpus import first_seen_novelty

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        p = _plan(first_seen_novelty(docs, n=2))
        assert "xxhash64" in p

    def test_matches_brute_force(self, spark):
        """Row-identical to the definition computed naively in Python —
        the fingerprint substitution must be invisible in the output."""
        from bloomy_etl_spark.operators.corpus import first_seen_novelty

        rows = [
            (1, "a b c a b"),          # bigrams {a b, b c, c a} (a b twice)
            (2, "a b x y"),            # shares "a b" with doc 1
            (3, "x y a b"),            # shares both with doc 2
            (4, "zz"),                 # too short for a bigram
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_distinct"], r["n_novel"], r["novelty_e6"])
            for r in first_seen_novelty(docs, n=2).collect()
        }

        # brute force over the same tokenization
        from bloomy_etl_spark.functions.text import word_ngrams

        grams = {
            r["doc_id"]: set(r["g"])
            for r in docs.select(
                "doc_id", word_ngrams(F.col("text"), 2).alias("g")
            ).collect()
        }
        first: dict[str, int] = {}
        for d in sorted(grams):
            for g in grams[d]:
                first.setdefault(g, d)
        want = {}
        for d, gs in grams.items():
            if not gs:
                continue
            novel = sum(1 for g in gs if first[g] == d)
            want[d] = (
                len(gs),
                novel,
                (1_000_000 * novel) // len(gs),
            )
        assert got == want
