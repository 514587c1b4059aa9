"""Differential test: LLM-data queries vs DuckDB at sf0.01, plus
operator-level semantic checks (LSH recall vs exact ground truth)."""

from __future__ import annotations

import pytest

from bloomy_etl_spark.operators.llm_queries import LLM_ORACLE_SQL, LLM_QUERIES

from tests.conftest import SF_ORACLE
from tests.oracle import compare, register_duck_views


@pytest.mark.parametrize("name", sorted(LLM_QUERIES))
def test_llm_query_matches_oracle(spark, duck, name):
    if name not in LLM_ORACLE_SQL:
        pytest.skip(f"{name} is a rows-only entry (non-SQL-expressible)")
    register_duck_views(duck, SF_ORACLE)
    df = LLM_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, LLM_ORACLE_SQL[name])


@pytest.mark.parametrize("name", sorted(LLM_QUERIES))
def test_llm_query_nonempty(spark, name):
    assert LLM_QUERIES[name](spark, SF_ORACLE).limit(1).count() == 1


def test_minhash_lsh_recall(spark):
    """LSH near-dups must recover ≥90% of the exact-Jaccard pairs (4 bands
    × 4 rows at J≥0.8 → miss probability ≤ (1-0.8⁴)⁴ ≈ 12% worst case,
    and the fixture pairs sit near J≈0.9 where it is ≈2%)."""
    exact = {
        (r["i"], r["j"])
        for r in LLM_QUERIES["q31_ngram_jaccard_neardups"](spark, SF_ORACLE).collect()
    }
    lsh = {
        (r["i"], r["j"])
        for r in LLM_QUERIES["q30_minhash_lsh_neardups"](spark, SF_ORACLE).collect()
    }
    assert lsh <= exact, "LSH-verified pairs must be a subset of exact pairs"
    assert len(lsh) >= 0.9 * len(exact), f"LSH recall too low: {len(lsh)}/{len(exact)}"


def test_simhash_covers_neardups(spark):
    """4×8-bit block LSH guarantees recall only for hamming ≤ 3 (pigeonhole
    over blocks); pairs at hamming 4-6 are probabilistic. Assert the
    guarantee exactly and ≥90% coverage of the exact near-dup pairs
    (fixture near-dups sit at hamming 0-6)."""
    exact = {
        (r["i"], r["j"])
        for r in LLM_QUERIES["q31_ngram_jaccard_neardups"](spark, SF_ORACLE).collect()
    }
    from bloomy_etl_spark.operators.dedup import simhash_near_dups
    from bloomy_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    sim = {
        (r["i"], r["j"])
        for r in simhash_near_dups(docs, max_hamming=6).select("i", "j").collect()
    }
    assert len(exact & sim) >= 0.9 * len(exact), (
        f"simhash near-dup coverage too low: {len(exact & sim)}/{len(exact)}"
    )
