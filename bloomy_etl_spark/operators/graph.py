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

__all__ = ["pagerank", "bfs_hops", "triangle_counts", "label_propagation",
           "k_core", "weighted_sssp", "basket_pairs"]


def basket_pairs(df: DataFrame, key: str, item: str,
                 weight: str = "w",
                 max_basket: int | None = None) -> DataFrame:
    """Ordered co-occurrence pairs ``(x < y, w = shared-key count)`` via
    per-key baskets and IN-ROW pair expansion — the r9 replacement for
    the ``distinct() ⋈ distinct() ON key`` self-join every co-purchase
    graph query used to build its edge set.

    Shape: ONE key-keyed hash-agg (``collect_set``, map-side combinable)
    and one pair-keyed count — the self-join's extra exchange and its
    key-grain broadcast/sort-merge are gone (guide §2.4), and pair
    expansion happens inside the row (the q112 cooccurrence shape), so
    worst-case work per key is C(basket, 2) with nothing key-grain ever
    shuffled twice.  ``array_sort`` fixes ``x < y`` by construction;
    ``collect_set`` gives the distinct (key, item) grain the old
    ``distinct()`` provided.  Callers needing a directed graph union the
    swapped columns AFTER the aggregate (half the shuffle keys).

    At 100 TB the cap that matters is basket size: per-key item counts
    are bounded by the domain (lineitems per order), exactly the
    bounded-actor assumption q140/q84 already rely on. The whole basket
    lives in ONE row, so an UNBOUNDED hot key is a single-row OOM where
    the old self-join was merely slow — ``max_basket`` is the guard: when
    set, any key whose basket exceeds it FAILS THE JOB LOUDLY
    (``assert_true`` inside the aggregate's projection, evaluated before
    the C(basket,2) expansion allocates anything) instead of silently
    degrading. Default ``None`` keeps the plan byte-identical for callers
    whose domain bound is structural (TPC-H lineitems/order ≤ 7); callers
    on open-domain keys should pass their contract bound and fall back to
    the pair self-join path if a legitimate basket can exceed memory.
    """
    baskets = (
        df.select(F.col(key).alias("__k"), F.col(item).alias("__i"))
        .groupBy("__k")
        .agg(F.array_sort(F.collect_set("__i")).alias("__ps"))
    )
    if max_basket is not None:
        baskets = baskets.select(
            "__k",
            F.when(
                F.assert_true(
                    F.size("__ps") <= F.lit(max_basket),
                    F.concat(
                        F.lit("basket_pairs: basket for key "),
                        F.col("__k").cast("string"),
                        F.lit(f" exceeds max_basket={max_basket} (size "),
                        F.size("__ps").cast("string"),
                        F.lit(")"),
                    ),
                ).isNull(),
                F.col("__ps"),
            ).alias("__ps"),
        )
    ps = F.col("__ps")
    pairs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pairs).alias("__e"))
        .select(F.col("__e.x").alias("x"), F.col("__e.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias(weight))
    )


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


def label_propagation(
    edges: DataFrame,
    x: str = "x",
    y: str = "y",
    *,
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with a
    deterministic tie-break — the COMMUNITY view of a graph, between
    connected components (q42's equivalence classes) and triangles
    (q141's local density): labels flow along edges and stabilize on
    densely connected clusters, splitting a single component into its
    communities.

    Input: canonical undirected edges (``x < y``, distinct).  Every
    node starts labeled with itself; each round, every node
    simultaneously adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label.  Both rules are exact integer
    comparisons, so a fixed-round run is replayed bit-identically by a
    sequential engine via one unrolled CTE per round (the q139/q97
    oracle shape) — no quantization needed.  Asynchronous LPA is
    faster to converge but schedule-dependent; the synchronous variant
    is the one with a replayable semantics, and fixed ``rounds`` keeps
    it bounded exactly like ``pagerank``.

    Scale: each round is one nbr-keyed join (labels ⋈ undirected
    edges) + one (node, label) hash-agg + one node-keyed window over
    the per-node label histogram — all keyed by node, no global
    barrier, state is one row per node.  Lineage is cut per round with
    ``session.pin`` so plans stay O(1) regardless of ``rounds``.
    Returns ``(node, label)`` for every vertex of the edge table.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    from pyspark.sql import Window

    und = edges.select(F.col(x).alias("node"), F.col(y).alias("nbr")).unionAll(
        edges.select(F.col(y).alias("node"), F.col(x).alias("nbr"))
    ).transform(pin, eager=True)
    labels = und.select("node").distinct().withColumn(
        "label", F.col("node")
    ).transform(pin, eager=False)
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        labels = (
            und.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
            .transform(pin, eager=False)
        )
    return labels


def weighted_sssp(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
    rounds: int = 4,
) -> DataFrame:
    """Multi-source weighted shortest distances, ``rounds`` of
    synchronous Bellman-Ford relaxation — the weighted companion to
    :func:`bfs_hops` (hop counts) for cost-weighted graphs: proximity
    to seed suppliers/domains/entities where edge strength matters.

    Non-negative INTEGER weights only: every relaxation decision is an
    exact ``min`` over int64 path costs, so a fixed-round run replays
    bit-identically as one unrolled CTE per round (the k-core/LPA
    oracle shape).  After ``rounds`` relaxations the result is exact
    for every node whose shortest path uses ≤ ``rounds`` edges — the
    standard bounded-round semantics; full convergence needs diameter
    rounds.

    Scale: each round is one node-keyed join (distances ⋈ out-edges) +
    one min-agg — the same per-round shuffle bound as
    :func:`label_propagation`; distances are one row per reached node
    and only ever tighten.  Pass edges pre-symmetrized for undirected
    graphs.  Returns ``(node, dist)`` for reached nodes.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"),
        F.col(weight).cast("long").alias("__w"),
    ).transform(pin, eager=True)
    dist = (
        sources.select(F.col(node).alias(node))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .transform(pin, eager=True)
    )
    for _ in range(rounds):
        relax = dist.join(e, dist[node] == e["__s"]).select(
            F.col("__d").alias(node),
            (F.col("dist") + F.col("__w")).cast("long").alias("dist"),
        )
        dist = (
            dist.unionByName(relax)
            .groupBy(node)
            .agg(F.min("dist").cast("long").alias("dist"))
            .transform(pin, eager=False)
        )
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    x: str = "x",
    y: str = "y",
    *,
    rounds: int = 8,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node keeps degree
    ≥ k — the COHESION view completing the graph family (q42
    components, q82 centrality, q97 reachability, q141 local density,
    q145 communities): cores survive the cascade where removing one
    weak node strips its neighbors below threshold too, which is why
    k-core is the standard backbone/spam-tail filter for web and
    citation graphs before expensive downstream analytics.

    Synchronous peel, fixed ``rounds``: each round deletes ALL nodes
    of current degree < k simultaneously, then recounts.  Every
    decision is an exact integer degree comparison, so a fixed-round
    run is replayed bit-identically by one unrolled CTE per round (the
    LPA oracle shape).  The peel converges in at most |V| rounds but
    in practice a handful — callers that need a certificate check
    ``converged`` (no node below k in the final survivor set; the
    fixed-point guarantee that the result IS the k-core rather than an
    intermediate peel state).

    Returns ``(node, degree, converged)`` for surviving nodes —
    ``degree`` is the node's degree WITHIN the core.

    Scale: each round is one node-keyed degree agg over the live edge
    table + two semi joins pruning the edge list — all keyed by node,
    edge state only ever shrinks, lineage cut per round with
    ``session.pin``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    live = edges.select(F.col(x).alias("x"), F.col(y).alias("y")).transform(
        pin, eager=True
    )
    for _ in range(rounds):
        deg = (
            live.select(F.col("x").alias("node"))
            .unionAll(live.select(F.col("y").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        live = (
            live.join(keep.withColumnRenamed("node", "x"), "x", "semi")
            .join(keep.withColumnRenamed("node", "y"), "y", "semi")
            .select("x", "y")
            .transform(pin, eager=False)
        )
    deg = (
        live.select(F.col("x").alias("node"))
        .unionAll(live.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .transform(pin, eager=True)
    )
    n_below = deg.filter(F.col("degree") < k).count()
    return deg.withColumn("converged", F.lit(n_below == 0))


def triangle_counts(edges: DataFrame, x: str = "x", y: str = "y",
                    kappa_base: int = 10_000_000_000) -> DataFrame:
    """Exact per-node triangle participation via DEGREE-ORDERED wedge
    counting (Suri & Vassilvitskii 2011, "the curse of the last
    reducer") — the clustering-structure signal (community density,
    link-spam detection) computed the one way that survives skew at
    scale.

    Input: canonical undirected edges (``x < y``, distinct). Each edge
    is oriented from the κ-smaller endpoint, κ = degree·base + node —
    a total order that bounds every out-neighborhood by O(√m)
    regardless of raw degree, so the wedge join's hottest key does
    O(√m) work instead of O(max_degree²) (the naive orientation's
    last-reducer pathology). Each triangle is generated exactly once,
    at its κ-minimal vertex, by joining the κ-ordered wedge (a→b, a→c,
    κ_b < κ_c) against the oriented edge (b→c).

    All decisions are integer comparisons on κ, so a sequential SQL
    engine replays the count bit-identically. Shuffles: two node-keyed
    degree joins, one src-keyed wedge self-join, one (b,c)-keyed edge
    probe, one node-keyed participation count — every key bounded by
    the orientation. Returns ``(node, n_triangles)``.
    """
    und = edges.select(F.col(x).alias("n")).unionAll(
        edges.select(F.col(y).alias("n"))
    )
    deg = und.groupBy("n").agg(F.count(F.lit(1)).alias("d"))

    def _k(dcol, ncol):
        return dcol * F.lit(kappa_base) + ncol

    e = (
        edges.join(deg.select(F.col("n").alias(x),
                              F.col("d").alias("__dx")), x)
        .join(deg.select(F.col("n").alias(y), F.col("d").alias("__dy")), y)
        .select(
            F.col(x), F.col(y),
            _k(F.col("__dx"), F.col(x)).alias("__kx"),
            _k(F.col("__dy"), F.col(y)).alias("__ky"),
        )
    )
    o = e.select(
        F.when(F.col("__kx") < F.col("__ky"), F.col(x))
        .otherwise(F.col(y)).alias("src"),
        F.when(F.col("__kx") < F.col("__ky"), F.col(y))
        .otherwise(F.col(x)).alias("dst"),
        F.greatest("__kx", "__ky").alias("kdst"),
    )
    w1 = o.select("src", F.col("dst").alias("b"), F.col("kdst").alias("kb"))
    w2 = o.select("src", F.col("dst").alias("c"), F.col("kdst").alias("kc"))
    wedges = w1.join(w2, "src").filter(F.col("kb") < F.col("kc"))
    tri = wedges.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
    ).select(F.col("src").alias("a"), "b", "c")
    part = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return part
