"""Distributed unigram-LM tokenizer training (the SentencePiece-family
counterpart of ``operators/bpe.py``): seed a candidate piece vocabulary
from corpus substrings, then EM-iterate piece probabilities where the
E-step is a Viterbi best-segmentation of every distinct word.

Same iterative-algorithm shape as k-means and BPE (driver-synchronized
rounds, small model state driver-side, bulk data distributed):

1. corpus collapses ONCE to (word, cnt) — all statistics are weighted
   by word frequency, so iteration cost is vocabulary-sized;
2. seed pieces: every substring of length ≤ ``max_piece_len`` scored by
   weighted occurrence count; top-V by (score, piece) plus every single
   character (coverage guarantee: any word is segmentable);
3. EM round: E-step runs Viterbi per DISTINCT word inside Arrow batches
   (``mapInPandas`` — the piece log-prob table, like k-means centroids,
   ships in the closure), emitting per-batch piece-usage partials
   (≤ V rows per batch); M-step is one tiny aggregation + driver-side
   renormalization. Zero-usage multi-char pieces are pruned; single
   chars are floored at a minimal usage so coverage never breaks.

Determinism (unit-verified against an independent sequential Python
reference): integer seed scores with (score desc, piece asc) ties;
Viterbi tie-break = higher log-prob, then FEWER pieces, then the
lexicographically smaller piece sequence; float math is fixed-order
(left-to-right positions). No RNG anywhere.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin

from bloomy_etl_spark.operators.bpe import word_frequencies


def viterbi_segment(word: str, logp: dict[str, float],
                    max_piece_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    total log-prob; ties → fewer pieces, then lexicographically smaller
    piece sequence. Pure function — shared verbatim by the executor
    closure and the tests' sequential reference."""
    n = len(word)
    # best[i] = (neg_total_logp, n_pieces, pieces_tuple) for word[:i]
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            if best[j] is None or piece not in logp:
                continue
            prev = best[j]
            cands.append(
                (prev[0] - logp[piece], prev[1] + 1, prev[2] + (piece,))
            )
        if cands:
            best[i] = min(cands)
    if best[n] is None:
        raise ValueError(f"word {word!r} not coverable by piece set")
    return list(best[n][2])


def seed_pieces(words: DataFrame, vocab_size: int = 200,
                max_piece_len: int = 4) -> DataFrame:
    """Candidate pieces: substrings scored by weighted occurrence count
    (every start position counts), top-``vocab_size`` by (score desc,
    piece asc), UNION all single characters (coverage floor). Returns
    (piece, score). One explode + one hash aggregate + a top-V heap."""
    # all substrings via nested transform (positions/lengths 1-based)
    subs = F.expr(
        f"flatten(transform(sequence(1, length(w)), i -> "
        f"transform(sequence(1, least({int(max_piece_len)}, length(w) - i + 1)), "
        f"ln -> substring(w, i, ln))))"
    )
    scored = (
        words.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("score"))
    )
    top = scored.filter(F.length("piece") > 1).orderBy(
        F.col("score").desc(), F.col("piece").asc()
    ).limit(vocab_size)
    chars = scored.filter(F.length("piece") == 1)
    return top.unionByName(chars).dropDuplicates(["piece"])


def unigram_train(docs: DataFrame, rounds: int = 2, vocab_size: int = 200,
                  max_piece_len: int = 4,
                  text_col: str = "text") -> list[dict]:
    """EM-train piece probabilities. Returns the final piece table as a
    sorted list of dicts (piece, prob, usage) — the artifact the
    tokenizer ships, small enough to live driver-side like a centroid
    table."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    words = pin(word_frequencies(docs, text_col), eager=False)
    seeds = seed_pieces(words, vocab_size, max_piece_len).collect()
    total0 = sum(r["score"] for r in seeds)
    logp = {r["piece"]: math.log(r["score"] / total0) for r in seeds}

    floored: dict[str, float] = {}
    for _ in range(rounds):
        usage = _estep_usage(words, logp, max_piece_len)
        # M-step: renormalize; prune unused multi-char pieces, floor
        # single chars (coverage must survive every round)
        floored = {
            p: (usage.get(p, 0.0) if len(p) > 1 else max(usage.get(p, 0.0), 1e-9))
            for p in logp
            if len(p) == 1 or usage.get(p, 0.0) > 0
        }
        total = sum(floored.values())
        logp = {p: math.log(u / total) for p, u in floored.items()}

    return [
        {"piece": p, "prob": math.exp(lp), "usage": floored[p]}
        for p, lp in sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    ]


def _estep_usage(words: DataFrame, logp: dict[str, float],
                 max_piece_len: int) -> dict[str, float]:
    """Distributed E-step: Viterbi-segment every distinct word inside
    Arrow batches, emit per-batch piece-usage partials (≤ V rows each),
    aggregate, return the V-sized usage dict."""
    lp = dict(logp)
    mpl = int(max_piece_len)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, float] = {}
        for pdf in batches:
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                for piece in viterbi_segment(str(w), lp, mpl):
                    acc[piece] = acc.get(piece, 0.0) + float(cnt)
        yield pd.DataFrame(
            {"piece": list(acc.keys()), "usage": list(acc.values())}
        )

    partials = words.select("w", "cnt").mapInPandas(
        run, schema="piece string, usage double"
    )
    rows = partials.groupBy("piece").agg(F.sum("usage").alias("usage")).collect()
    return {r["piece"]: r["usage"] for r in rows}


def unigram_segment(docs: DataFrame, pieces: list[dict],
                    max_piece_len: int = 4, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Segment documents with a trained piece table: per doc, unigram
    token count vs base character count (the compression audit, same
    contract as ``bpe_segment``). Viterbi runs once per DISTINCT word;
    occurrences join back to their word's piece count."""
    from bloomy_etl_spark.functions.text import tokens

    logp = {d["piece"]: math.log(d["prob"]) for d in pieces}
    mpl = int(max_piece_len)
    word = F.explode(tokens(F.col(text_col))).alias("w")
    base = docs.select(F.col(id_col), word).filter(F.col("w").rlike("^[a-z]+$"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [len(viterbi_segment(str(w), logp, mpl)) for w in pdf["w"]]
            yield pdf.assign(n_pieces=out)

    distinct = base.select("w").distinct().mapInPandas(
        run, schema="w string, n_pieces long"
    ).withColumn("n_chars", F.length("w"))
    return base.join(distinct, "w").groupBy(id_col).agg(
        F.sum("n_pieces").alias("unigram_tokens"),
        F.sum("n_chars").alias("char_tokens"),
        F.round(F.sum("n_pieces") / F.sum("n_chars"), 4).alias("compression"),
    )
