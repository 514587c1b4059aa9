"""Iterative graph analytics over edge tables: PageRank.

Complements the connected-components resolver (``dedup.py:682`` — the
*equivalence* view of a similarity graph) with the *centrality* view:
PageRank over a weighted directed edge table, the standard authority
signal for corpus curation (domain weighting à la Common Crawl) and
entity importance.

Scale design
------------
The canonical distributed shape: edges are normalized once (out-weight
fractions), then each round is one shuffle — ``ranks ⋈ edges`` grouped
by destination.  Ranks and edges stay DataFrames end-to-end; the only
driver-resident value is the vertex count (a scalar).  Dangling-mass
redistribution (vertices with no out-edges) is folded in as a 1-row
aggregate cross-joined back — no per-round ``collect()``.  Lineage is
cut with a per-round ``localCheckpoint`` exactly like the
connected-components loop, so plans stay O(1) per round.

Determinism: per-round ranks are quantized to ``quantize_dp`` decimals
(the k-means trick, ``clustering.py``) so a fixed-round run is exactly
replayable by a sequential engine — that replay is the DuckDB oracle
for q82.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin

__all__ = ["pagerank", "bfs_hops"]


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 10,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node.

    Returns ``(node, dist)`` for every node within ``max_hops`` of the
    source set (sources themselves at 0).  The canonical frontier
    iteration: each round joins the CURRENT frontier (not the whole
    reached set) against the edge table, anti-joins out already-reached
    nodes, and checkpoints — per-round shuffle is O(frontier ⋈ edges),
    and the loop exits early on an empty frontier (one bounded
    ``isEmpty`` driver sync per round, the k-means/connected-components
    posture).  Distances are exact integers, so a fixed-round run is
    replayable by a recursive-CTE oracle with no quantization at all.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    dist = (
        sources.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .transform(pin, eager=False)
    )
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s"])
            .select(F.col("__d").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(hop))
            .transform(pin, eager=False)
        )
        if nxt.isEmpty():
            break
        dist = pin(dist.unionByName(nxt), eager=False)
        frontier = nxt.select("node")
    return dist


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    damping: float = 0.85,
    rounds: int = 10,
    quantize_dp: int = 9,
) -> DataFrame:
    """Weighted PageRank, fixed ``rounds`` of power iteration.

    Returns ``(node, rank)`` for every vertex appearing as a source or
    destination.  Multi-edges are combined by weight sum; a missing
    ``weight`` counts each edge as 1.  Vertices with no out-edges
    (dangling) redistribute their mass uniformly each round, so total
    rank stays 1 up to quantization.
    """
    w = F.lit(1.0) if weight is None else F.col(weight).cast("double")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    e = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("frac")
    )
    # session.pin (checkpoint in every branch): ContextCleaner
    # reclaims the blocks once the returned ranks DataFrame is dropped —
    # no session-lifetime CacheManager entry even across many calls.
    e = pin(e, eager=True)
    verts = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(pin, eager=True)
    )
    n = verts.count()  # the one driver-resident scalar
    base, d = (1.0 - damping) / n, damping
    has_out = e.select("src").distinct()
    ranks = verts.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(rounds):
        dangling = (
            ranks.join(has_out, ranks["node"] == has_out["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            ranks.join(e, ranks["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("c"))
        )
        ranks = (
            verts.join(contrib, verts["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))  # 1-row scalar, broadcast
            .select(
                "node",
                F.round(
                    F.lit(base)
                    + F.lit(d)
                    * (F.coalesce(F.col("c"), F.lit(0.0))
                       + F.col("dm") / F.lit(float(n))),
                    quantize_dp,
                ).alias("rank"),
            )
            .transform(pin, eager=False)
        )
    return ranks
