"""Unigram-LM tokenizer training (operators/unigram.py) vs an
independent sequential Python reference implementing the same spec,
plus coverage/normalization/partition-invariance properties."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.unigram import (
    seed_pieces,
    unigram_segment,
    unigram_train,
    viterbi_segment,
)
from bloomy_etl_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# sequential reference: plain Python over a {word: cnt} dict, written
# from the documented spec (not from the Spark code paths)
# ---------------------------------------------------------------------------
def _ref_seed(wc: dict[str, int], vocab_size: int, mpl: int) -> dict[str, int]:
    score: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(mpl, len(w) - i) + 1):
                score[w[i:i + ln]] += c
    multi = sorted(
        ((p, s) for p, s in score.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:vocab_size]
    out = dict(multi)
    out.update({p: s for p, s in score.items() if len(p) == 1})
    return out


def _ref_viterbi(word: str, logp: dict[str, float], mpl: int) -> list[str]:
    best = {0: (0.0, 0, ())}
    for i in range(1, len(word) + 1):
        cands = []
        for j in range(max(0, i - mpl), i):
            piece = word[j:i]
            if j in best and piece in logp:
                prev = best[j]
                cands.append((prev[0] - logp[piece], prev[1] + 1, prev[2] + (piece,)))
        if cands:
            best[i] = min(cands)
    return list(best[len(word)][2])


def _ref_train(wc: dict[str, int], rounds: int, vocab_size: int, mpl: int):
    seeds = _ref_seed(wc, vocab_size, mpl)
    total0 = sum(seeds.values())
    logp = {p: math.log(s / total0) for p, s in seeds.items()}
    for _ in range(rounds):
        usage: Counter = Counter()
        for w, c in wc.items():
            for piece in _ref_viterbi(w, logp, mpl):
                usage[piece] += c
        floored = {
            p: (usage.get(p, 0.0) if len(p) > 1 else max(usage.get(p, 0.0), 1e-9))
            for p in logp
            if len(p) == 1 or usage.get(p, 0.0) > 0
        }
        total = sum(floored.values())
        logp = {p: math.log(u / total) for p, u in floored.items()}
    return {p: math.exp(lp) for p, lp in logp.items()}


def _word_counts(spark, sf_dir) -> dict[str, int]:
    from bloomy_etl_spark.operators.bpe import word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    return {
        r["w"]: r["cnt"] for r in word_frequencies(docs).collect()
    }


class TestUnigram:
    def test_train_matches_sequential_reference(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        got = {
            d["piece"]: d["prob"]
            for d in unigram_train(docs, rounds=2, vocab_size=50)
        }
        want = _ref_train(_word_counts(spark, SF_SMOKE), 2, 50, 4)
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-9), p

    def test_probabilities_normalized_and_sorted(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        pieces = unigram_train(docs, rounds=1, vocab_size=30)
        assert sum(d["prob"] for d in pieces) == pytest.approx(1.0, rel=1e-9)
        probs = [d["prob"] for d in pieces]
        assert probs == sorted(probs, reverse=True)

    def test_viterbi_tie_breaks(self):
        # equal log-probs: prefer fewer pieces, then lexicographic
        logp = {p: math.log(0.25) for p in ("ab", "cd", "a", "b", "c", "d")}
        assert viterbi_segment("abcd", logp, 2) == ["ab", "cd"]
        logp2 = {p: math.log(1 / 3) for p in ("ax", "xa", "x", "a")}
        assert viterbi_segment("axa", logp2, 2) == ["a", "xa"]

    def test_viterbi_uncoverable_raises(self):
        with pytest.raises(ValueError):
            viterbi_segment("abc", {"a": 0.0}, 2)

    def test_seed_covers_all_chars(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        from bloomy_etl_spark.operators.bpe import word_frequencies

        words = word_frequencies(docs)
        pieces = {r["piece"] for r in seed_pieces(words, 10).collect()}
        chars = {
            c
            for r in words.select("w").collect()
            for c in r["w"]
        }
        assert chars <= pieces

    def test_partition_invariance(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        a = unigram_train(docs.repartition(7), rounds=1, vocab_size=20)
        b = unigram_train(docs.coalesce(1), rounds=1, vocab_size=20)
        assert [(d["piece"], pytest.approx(d["prob"], rel=1e-12)) for d in a] == [
            (d["piece"], d["prob"]) for d in b
        ]

    def test_segment_audit(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        pieces = unigram_train(docs, rounds=1, vocab_size=50)
        out = unigram_segment(docs, pieces)
        rows = out.collect()
        assert len(rows) > 0
        for r in rows:
            # multi-char pieces exist, so compression strictly helps
            assert 0 < r["unigram_tokens"] <= r["char_tokens"]
            assert 0 < r["compression"] <= 1.0

    def test_bad_rounds(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        with pytest.raises(ValueError):
            unigram_train(docs, rounds=0)
