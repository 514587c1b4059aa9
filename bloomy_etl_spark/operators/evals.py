"""Retrieval-quality evaluation: nDCG@k, MRR, recall@k — in-engine.

A retrieval stack (BM25 q68, hybrid RRF q122, the ANN tiers
q33/q36/q101–q111) needs its quality MEASURED where the data lives:
ship the ranked lists to a driver-side eval script and the audit stops
scaling with the query set.  This module computes the standard IR
metrics as one query-grain aggregation over the ranked results —
the label-based companion to q126's recall-vs-exact ANN audit
(`similarity.retrieval_metrics`, which compares two ranked lists;
this module judges ONE ranked list against relevance labels).

Exactness: with integer relevance grades, every metric here is exact
integer arithmetic.  The per-position DCG discounts ``1/log₂(r+1)``
are pre-quantized to e9 ONCE in Python (`dcg_weights_e9`) and written
into BOTH the Spark plan and the DuckDB oracle as the same literal
table — the q138 convention (quantize the transcendental BEFORE any
arithmetic) — so DCG, the ideal-DCG prefix table, nDCG millionths,
MRR millionths, and recall millionths are deterministic integer
sequences in every engine.

Scale: the ranked input is query-grain × k rows (top-k has already cut
the corpus); metrics are ONE map-side-combinable hash-agg over it plus
a broadcast of the 2·k-entry literal weight tables.  Nothing here
touches corpus grain.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dcg_weights_e9", "idcg_prefix_e9",
           "judged_retrieval_metrics"]


def dcg_weights_e9(k: int) -> list[int]:
    """``floor(1e9 / log2(r+1))`` for ranks 1..k — the shared literal
    discount table (IEEE log2 evaluated once, in Python, never inside
    an engine)."""
    return [int(1_000_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]


def idcg_prefix_e9(k: int) -> list[int]:
    """Ideal-DCG prefix sums: entry m (1-based) is the DCG of m
    relevant documents ranked perfectly."""
    w = dcg_weights_e9(k)
    out, acc = [], 0
    for x in w:
        acc += x
        out.append(acc)
    return out


def judged_retrieval_metrics(rels: DataFrame, k: int,
                      query_col: str = "query_id",
                      rank_col: str = "rank",
                      rel_col: str = "rel",
                      n_rel_col: str = "n_relevant") -> DataFrame:
    """Per-query IR metrics over a judged ranked list.

    ``rels`` carries one row per (query, rank ≤ k) with binary
    relevance ``rel_col`` ∈ {0, 1} and the query's TOTAL relevant
    count ``n_rel_col`` (constant per query — needed for recall and
    the ideal DCG).  Returns one row per query::

        (query, n_relevant, hits, dcg_e9, idcg_e9,
         ndcg_e6, mrr_e6, recall_e6)

    with ``ndcg_e6 = dcg·10⁶ div idcg`` (0 when nothing is relevant),
    ``mrr_e6 = 10⁶ div first-relevant-rank`` (0 when no hit), and
    ``recall_e6 = hits·10⁶ div n_relevant``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w_arr = F.array(*[F.lit(x).cast("long") for x in dcg_weights_e9(k)])
    p_arr = F.array(*[F.lit(x).cast("long") for x in idcg_prefix_e9(k)])
    rel = F.col(rel_col).cast("long")
    per_q = (
        rels.filter(F.col(rank_col) <= k)
        .groupBy(query_col)
        .agg(
            F.first(F.col(n_rel_col)).cast("long").alias("n_relevant"),
            F.sum(rel).cast("long").alias("hits"),
            F.sum(rel * F.element_at(w_arr, F.col(rank_col).cast("int")))
            .cast("long").alias("dcg_e9"),
            F.min(F.when(rel == 1, F.col(rank_col))).alias("__fr"),
        )
    )
    ideal_m = F.least(F.col("n_relevant"), F.lit(k)).cast("int")
    return per_q.select(
        query_col,
        "n_relevant",
        "hits",
        "dcg_e9",
        F.when(ideal_m >= 1, F.element_at(p_arr, ideal_m))
        .otherwise(F.lit(0)).cast("long").alias("idcg_e9"),
        F.col("__fr").cast("long").alias("first_rel_rank"),
    ).select(
        query_col,
        "n_relevant",
        "hits",
        "dcg_e9",
        "idcg_e9",
        F.when(F.col("idcg_e9") > 0,
               F.expr("(dcg_e9 * 1000000) DIV idcg_e9"))
        .otherwise(F.lit(0)).cast("long").alias("ndcg_e6"),
        F.when(F.col("first_rel_rank").isNotNull(),
               F.expr("1000000 DIV first_rel_rank"))
        .otherwise(F.lit(0)).cast("long").alias("mrr_e6"),
        F.when(F.col("n_relevant") > 0,
               F.expr("(hits * 1000000) DIV n_relevant"))
        .otherwise(F.lit(0)).cast("long").alias("recall_e6"),
    )
