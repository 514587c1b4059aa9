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
    """Manku-style blocking (max_hamming+1 = 7 blocks) is exhaustive by
    pigeonhole, so ≥90% coverage of the exact near-dup pairs only reflects
    how well word-set simhash tracks shingle Jaccard on the fixture."""
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


def test_simhash_blocking_exhaustive_vs_brute_force(spark):
    """The pigeonhole guarantee, end to end: blocked simhash_near_dups must
    return EXACTLY the brute-force hamming ≤ k pair set (the round-1
    defaults dropped pairs whose differing bits spanned all 4 blocks)."""
    from pyspark.sql import functions as F

    from bloomy_etl_spark.operators.dedup import simhash, simhash_near_dups
    from bloomy_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").filter(F.col("doc_id") < 200)
    for k in (3, 6):
        blocked = {
            (r["i"], r["j"])
            for r in simhash_near_dups(docs, max_hamming=k).select("i", "j").collect()
        }
        fps = simhash(docs)
        a = fps.select(F.col("doc_id").alias("i"), F.col("simhash").alias("sa"))
        b = fps.select(F.col("doc_id").alias("j"), F.col("simhash").alias("sb"))
        brute = {
            (r["i"], r["j"])
            for r in a.crossJoin(b)
            .filter(F.col("i") < F.col("j"))
            .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= k)
            .collect()
        }
        assert blocked == brute, (
            f"k={k}: blocked {len(blocked)} pairs != brute-force {len(brute)}"
        )


def test_simhash_rejects_pigeonhole_violation(spark):
    from bloomy_etl_spark.operators.dedup import simhash_near_dups
    from bloomy_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(docs, max_hamming=6, n_blocks=4)


def test_simhash_block_layout_covers_all_bits():
    from bloomy_etl_spark.operators.dedup import simhash_block_layout

    for bits, n_blocks in ((32, 7), (64, 4), (32, 5), (16, 16)):
        layout = simhash_block_layout(bits, n_blocks)
        covered = []
        for off, w in layout:
            assert w >= 1
            covered.extend(range(off, off + w))
        assert covered == list(range(bits))


def test_ngram_posting_cap_noop_when_above_max_freq(spark):
    """With the cap above the max observed posting size the pair output is
    identical; with a tight cap it is a subset and the dropped-shingle
    observation fires."""
    from pyspark.sql import Observation

    from bloomy_etl_spark.operators.dedup import ngram_jaccard_pairs
    from bloomy_etl_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    base = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs).collect()
    }
    capped_hi = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, max_doc_freq=10**6).collect()
    }
    assert capped_hi == base

    obs = Observation("dropped")
    lo = ngram_jaccard_pairs(docs, max_doc_freq=2, dropped_obs=obs).collect()
    lo_pairs = {(r["i"], r["j"]) for r in lo}
    assert lo_pairs <= set(base)
    assert obs.get["dropped_shingles"] > 0
    # reported jaccard under a cap is a lower bound of the uncapped value
    for r in lo:
        assert r["jaccard"] <= base[(r["i"], r["j"])] + 1e-9
