"""Bradley-Terry preference-strength estimation from pairwise duels.

The pairwise-preference model behind RLHF reward data, chatbot-arena
leaderboards and search interleaving: duel outcomes ``i beat j`` fit
item strengths ``w`` with ``P(i beats j) = w_i / (w_i + w_j)``.  This
is the model-fitting step between :mod:`labels` (per-item majority
vote) and training — it turns O(n²) noisy comparisons into one
calibrated scalar per item.

Fitted with Hunter's MM iteration (the standard batch algorithm:
``w_i ← W_i / Σ_j g_ij/(w_i+w_j)`` where ``W_i`` is i's total wins
and ``g_ij`` the games between i and j), run a FIXED number of rounds
in EXACT integer arithmetic: strengths live at e6 scale, the
per-pair reciprocal terms at e12, every division a floor — so the
whole fit is a deterministic integer sequence any engine replays
bit-for-bit (the DuckDB oracle unrolls the same rounds in SQL).  No
float ever enters the loop; q82's round-to-9dp convention is the
fallback this avoids entirely.

Scale design
------------
The duel log (the 100 TB side) is touched ONCE: two map-side-combinable
hash-aggs reduce it to per-item win totals and per-pair game counts.
Rounds then iterate over the PAIR table (bounded by the item-domain
choose 2, not by duels); strengths are item-grain.  Joins hash on the
item key — when the item domain is small (label sets, brands, model
variants) AQE broadcasts them; when it is huge the same plan shuffles
pair-grain only.  Per-round lineage is cut with ``session.pin``
exactly like the pagerank/LPA loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin

__all__ = ["bradley_terry", "bradley_terry_from_counts", "duel_counts"]


def duel_counts(duels: DataFrame, winner: str = "winner",
                loser: str = "loser") -> DataFrame:
    """Reduce a duel log to directional counts ``(i, j, n)`` — i beat
    j ``n`` times.  The ONLY corpus-grain touch of the whole fit, one
    map-side-combinable hash-agg; counts are plain sums, so they
    compose across any partition of the log (the streaming ingest's
    soundness in one line)."""
    return (
        duels.select(F.col(winner).alias("i"), F.col(loser).alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def bradley_terry(duels: DataFrame, winner: str = "winner",
                  loser: str = "loser", *, rounds: int = 3,
                  scale: int = 1_000_000) -> DataFrame:
    """Fit integer Bradley-Terry strengths to a duel log.

    ``duels`` carries one row per observed comparison.  Returns
    ``(item, n_wins, n_games, strength_e6)`` — strengths at ``scale``
    (default millionths), comparable across items; an average item
    sits near ``scale``; winless items floor at 1.

    The MM update per round, all integer::

        den_i = Σ_j  (g_ij · scale²) div (w_i + w_j)
        w_i'  = max(1, (W_i · scale²) div den_i)

    ``W_i·scale²`` bounds at ~9.2·10¹⁸/scale² wins per item — 9.2
    million at the default, loose for any label/brand/model domain;
    a larger domain calls for a smaller ``scale``.
    """
    return bradley_terry_from_counts(
        duel_counts(duels, winner, loser), rounds=rounds, scale=scale
    )


def bradley_terry_from_counts(counts: DataFrame, *, rounds: int = 3,
                              scale: int = 1_000_000) -> DataFrame:
    """The MM fit from directional counts ``(i, j, n)`` — the entry
    point the streaming duel ingest re-fits from (counts are additive
    across batches, so the streamed fit is bit-identical to the batch
    fit by construction).  Semantics and return shape exactly as
    :func:`bradley_terry`."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    wins = counts.groupBy("i").agg(F.sum("n").cast("long").alias("n_wins"))
    # unordered pair game counts, emitted in both directions so each
    # side's denominator groups over its own key
    g = (
        counts.select(F.least("i", "j").alias("a"),
                      F.greatest("i", "j").alias("b"), "n")
        .groupBy("a", "b")
        .agg(F.sum("n").cast("long").alias("g"))
    )
    sym = pin(
        g.select(F.col("a").alias("i"), F.col("b").alias("j"), "g").union(
            g.select(F.col("b").alias("i"), F.col("a").alias("j"), "g")
        ),
        eager=True,
    )
    items = pin(
        sym.select("i").distinct()
        .join(wins, "i", "left")
        .select(
            "i",
            F.coalesce("n_wins", F.lit(0)).cast("long").alias("n_wins"),
        ),
        eager=True,
    )
    w = items.select("i", F.lit(scale).cast("long").alias("w"))
    for _ in range(rounds):
        den = (
            sym.join(w.select(F.col("i"), F.col("w").alias("__wi")), "i")
            .join(
                w.select(F.col("i").alias("j"), F.col("w").alias("__wj")),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(
                        f"(g * CAST({scale * scale} AS BIGINT)) "
                        "DIV (__wi + __wj)"
                    )
                ).alias("__den")
            )
        )
        w = pin(
            items.join(den, "i").select(
                "i",
                F.greatest(
                    F.expr(
                        f"(n_wins * CAST({scale * scale} AS BIGINT)) "
                        "DIV __den"
                    ),
                    F.lit(1).cast("long"),
                ).alias("w"),
            ),
            eager=False,
        )
    games = sym.groupBy("i").agg(F.sum("g").cast("long").alias("n_games"))
    return (
        items.join(games, "i")
        .join(w, "i")
        .select(
            F.col("i").alias("item"),
            "n_wins",
            "n_games",
            F.col("w").alias("strength_e6"),
        )
    )
