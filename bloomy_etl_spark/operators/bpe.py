"""Distributed BPE merge training (byte-pair encoding vocabulary
induction) — the tokenizer-training step of an LLM data pipeline, run as
a Spark iterative algorithm in the same driver-synchronized shape as
k-means (``operators/clustering.py``): per round, pair counting is one
corpus-wide hash aggregate, and only the single winning pair (a handful
of bytes) ever reaches the driver.

Algorithm (Sennrich et al. 2016, the standard word-level BPE trainer):

1. collapse the corpus to (word, count) — BPE statistics are weighted by
   word frequency, so the corpus compresses to its vocabulary before any
   iteration touches it;
2. represent each word as a delimited symbol string ``<c><a><t>`` —
   every symbol individually bracketed, so a plain string ``replace`` of
   ``<a><b>`` → ``<ab>`` IS the greedy leftmost non-overlapping BPE
   merge (replacement can never match across symbol boundaries, and
   consumed matches cannot overlap — ``<a><a><a>`` under merge (a,a)
   correctly becomes ``<aa><a>``);
3. per round: count adjacent symbol pairs weighted by word count (one
   shuffle keyed by pair), take the global argmax (ties: lexicographic
   on the pair — deterministic across engines), apply the merge to every
   word's symbol string (pure map), repeat.

Determinism: counts are integers, ties lexicographic, no RNG — a DuckDB
oracle replays the whole training as a CTE chain (q62).

Scale: the iteration state is the (word, count, symbols) table —
vocabulary-sized, not corpus-sized (the corpus is touched exactly once,
in step 1). Pair counting shuffles vocab-sized data per round with
map-side combine; the driver holds one (pair, count) row per round.
This is how production BPE trainers run on web corpora: the
frequency-table collapse is what makes 10¹¹ words tractable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin

from bloomy_etl_spark.functions.text import tokens


def _symbols(rep):
    """``<a><bc><d>`` → array ['a','bc','d']."""
    return F.split(F.regexp_replace(rep, "^<|>$", ""), "><")


def _adjacent_pairs(syms):
    """Adjacent (lhs, rhs) symbol pairs, in order, with repeats."""
    n = F.size(syms) - 1
    return F.zip_with(
        F.slice(syms, 1, n),
        F.slice(syms, 2, n),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over alphabetic tokens — the corpus collapse (step 1).
    BPE is defined over a closed symbol alphabet; restricting to
    ``[a-z]+`` keeps the bracket delimiters collision-free (real
    deployments operate on bytes with a 256-symbol base alphabet —
    the trainer below is representation-agnostic past this point)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(docs: DataFrame, rounds: int = 3,
              text_col: str = "text") -> tuple[list[dict], DataFrame]:
    """Run ``rounds`` BPE merge iterations. Returns ``(merges, vocab)``:
    ``merges`` = one dict per round (round, lhs, rhs, merged,
    pair_count); ``vocab`` = the final (word, cnt, rep) symbol table
    with all merges applied (lazy — one vocab-sized plan).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    words = word_frequencies(docs, text_col)
    # one eager-ish checkpoint: the corpus scan + vocab collapse runs
    # once; every round's pair count re-executes only the (cheap,
    # vocab-sized) replace chain above it
    state = pin(words.select(
        "w", "cnt", F.regexp_replace("w", "(.)", "<$1>").alias("rep")
    ), eager=False)
    merges: list[dict] = []
    for r in range(1, rounds + 1):
        pairs = state.select("cnt", F.explode(_adjacent_pairs(_symbols(F.col("rep")))).alias("p"))
        top = (
            pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not top:  # every word is a single symbol — nothing to merge
            break
        lhs, rhs, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
        merges.append(
            {"round": r, "lhs": lhs, "rhs": rhs, "merged": lhs + rhs,
             "pair_count": c}
        )
        state = state.withColumn(
            "rep",
            F.replace(
                "rep", F.lit(f"<{lhs}><{rhs}>"), F.lit(f"<{lhs}{rhs}>")
            ),
        )
    return merges, state


def bpe_merge_table(docs: DataFrame, rounds: int = 3,
                    text_col: str = "text") -> DataFrame:
    """The learned merge table as a DataFrame (round, lhs, rhs, merged,
    pair_count) — the artifact a tokenizer ships with."""
    merges, _ = bpe_train(docs, rounds, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        [(m["round"], m["lhs"], m["rhs"], m["merged"], m["pair_count"])
         for m in merges],
        "round int, lhs string, rhs string, merged string, pair_count bigint",
    )


def bpe_segment(docs: DataFrame, merges: list[dict],
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge table to segment documents: per doc, the
    BPE token count under the merges vs the base character count — the
    compression-ratio audit used to validate a tokenizer on held-out
    text.

    The replace chain runs once per DISTINCT word (vocabulary table),
    not per token occurrence — occurrences then join to their word's
    piece count. Zipf makes this the difference between O(vocab) and
    O(corpus) regex work; the vocab side of the join is the small side
    (broadcast below the threshold, shuffle join beyond it — the
    planner's call via AQE/thresholds, not hard-coded)."""
    word = F.explode(tokens(F.col(text_col))).alias("w")
    base = docs.select(F.col(id_col), word).filter(
        F.col("w").rlike("^[a-z]+$")
    )
    rep = F.regexp_replace("w", "(.)", "<$1>")
    for m in merges:
        rep = F.replace(
            rep, F.lit(f"<{m['lhs']}><{m['rhs']}>"), F.lit(f"<{m['merged']}>")
        )
    pieces = base.select("w").distinct().select(
        "w", F.size(_symbols(rep)).alias("n_pieces"),
        F.length("w").alias("n_chars"),
    )
    return base.join(pieces, "w").groupBy(id_col).agg(
        F.sum("n_pieces").alias("bpe_tokens"),
        F.sum("n_chars").alias("char_tokens"),
        F.round(F.sum("n_pieces") / F.sum("n_chars"), 4).alias("compression"),
    )
