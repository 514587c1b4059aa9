"""SemDeDup-style semantic deduplication: k-means blocking + within-
cluster cosine pruning (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", 2023).

Exact pairwise cosine over a corpus is O(n²); SemDeDup's observation is
that semantic duplicates land in the same k-means cluster, so pairwise
work only needs to happen WITHIN clusters — O(Σ n_c²), tunable by k.

Spark shape:

* assign — ``clustering.assign_clusters`` / ``kmeans_lloyd``: map-side
  scoring against literal centroids, deterministic (no RNG, quantized
  means, low-index ties);
* pair — cluster members become a sorted id array and expand through
  ``dedup.bucket_pairs`` (the same skew-safe path q30/q31/q32 use):
  small clusters expand C(n,2) in-row; a HOT cluster — the skew
  reality when k is under-sized for the corpus — is chunked into
  cap-sized slices spread round-robin across the cluster, so per-task
  pair work is bounded by cap² regardless of cluster size. Vectors
  join back onto the id pairs afterwards (two hash joins on the id),
  so no row ever holds a cluster's worth of vectors. ``k`` remains
  the pair-volume knob (SemDeDup uses k ≈ corpus/1000;
  :func:`semantic_dedup` auto-sizes that way when k is not given);
* prune — survivors are exactly the ids with NO lower-id neighbor
  above the threshold (one distinct + one join, no iteration).
  Deterministic canonical representatives (SemDeDup itself keeps an
  arbitrary or centroid-far member; a fixed rule makes the output
  replayable). Shape notes: in a chain a–b–c (a,c not near each other)
  both b and c drop, like connected components; in a star 1–3, 2–3
  (1,2 not near) only 3 drops where CC would also drop 2 — i.e. the
  rule never merges two mutually-distant LOW ids through a shared
  neighbor, but a dropped doc's lower-id witness may itself be
  dropped. For transitive group-accurate dedup use
  ``dedup.dedup_clusters`` on :func:`semantic_dup_pairs` output.

Output of :func:`semantic_dedup`: the input ids with ``cluster``,
``kept`` (bool) — filter ``kept`` for the deduplicated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.functions.vectors import dot, norm
from bloomy_etl_spark.operators.clustering import assign_clusters, kmeans_lloyd

__all__ = ["semantic_dup_pairs", "semantic_dedup"]


def semantic_dup_pairs(embs: DataFrame, centroids: list[list[float]],
                       threshold: float = 0.95, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """(i, j, cluster, cos_sim) for every same-cluster pair with
    cosine ≥ threshold, i < j. Cosine is computed in index order
    (engine-stable) on the raw vectors — no normalization pass.

    Pair generation routes through :func:`dedup.bucket_pairs` (sorted
    member-id arrays, in-row C(n,2) for small clusters, cap²-bounded
    chunk expansion for hot ones), so one dominant cluster can never
    pin the whole pair space on a single task; vectors join back by id
    AFTER expansion, keeping every row O(d)."""
    assigned = assign_clusters(embs, centroids, id_col, vec_col)
    return _pairs_from_assigned(assigned, threshold, id_col, vec_col)


def _pairs_from_assigned(assigned: DataFrame, threshold: float,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         normalized: bool = False) -> DataFrame:
    """Pair stage over a cluster-assignment DataFrame. NOTE: this plan
    references ``assigned`` three times (buckets, both pair endpoints);
    Spark recomputes an un-pinned projection at every reference, so
    callers holding an expensive assignment (O(k·d) argmin per row)
    should pin it first — :func:`semantic_dedup` does.

    ``normalized=True`` declares ``vec_col`` already unit-normalized
    (``functions.vectors.normalize``): cosine is then a plain dot — the
    per-pair norm product and the per-endpoint norm column both vanish,
    the cheap once-per-row-instead-of-once-per-pair trade every vector
    store makes. :func:`semantic_dedup` normalizes inside its pinned
    assignment so the division happens exactly once per vector."""
    from bloomy_etl_spark.operators.dedup import bucket_pairs

    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "cluster"]
    if not normalized:
        cols.insert(2, norm(F.col(vec_col)).alias("n"))
    assigned = assigned.select(*cols)
    buckets = assigned.groupBy("cluster").agg(
        F.array_sort(F.collect_list("id")).alias("ms")
    )
    pairs = bucket_pairs(buckets, carry=("cluster",))
    side = ["v"] if normalized else ["v", "n"]
    va = assigned.select(
        F.col("id").alias("a"),
        *[F.col(c).alias(c + "a") for c in side],
    )
    vb = assigned.select(
        F.col("id").alias("b"),
        *[F.col(c).alias(c + "b") for c in side],
    )
    cos = dot(F.col("va"), F.col("vb"))
    if not normalized:
        cos = cos / (F.col("na") * F.col("nb"))
    return (
        pairs.join(va, "a").join(vb, "b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("a").alias("i"), F.col("b").alias("j"),
            "cluster", F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def semantic_dedup(embs: DataFrame, k: int | None = None,
                   threshold: float = 0.95,
                   iters: int = 2, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   centroids: list[list[float]] | None = None) -> DataFrame:
    """Full SemDeDup pass: cluster, find within-cluster near-dups, keep
    the lowest id of every duplicate group. Returns
    ``(id_col, cluster, kept)`` for the whole corpus.

    ``k=None`` auto-sizes the blocking factor as SemDeDup prescribes
    (k ≈ corpus/1000, floored at 2, capped at the corpus size) — one
    count() job; pass k explicitly to skip it. BEHAVIOR NOTE (r7): the
    default changed from a fixed ``k=8`` to this auto-sizing — callers
    that relied on the old default's exact clustering should pass
    ``k=8`` explicitly. Pre-trained ``centroids`` skip the Lloyd rounds
    entirely (callers that reuse one training across several passes).

    Cosine note: vectors are unit-normalized once inside the pinned
    assignment, so pair similarity is a plain dot product; results can
    differ from the raw ``dot/(|a||b|)`` form only in the last ulp."""
    from bloomy_etl_spark.session import pin

    if centroids is not None:
        assigned = assign_clusters(embs, centroids, id_col, vec_col)
    else:
        if k is None:
            n = embs.count()
            k = min(max(2, round(n / 1000)), n)
        centroids, assigned = kmeans_lloyd(
            embs, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
    # the plan below references the assignment FOUR times (cluster
    # buckets, both pair endpoints, the kept-join spine); pin it so the
    # O(k·d)-per-row argmin executes once, not four times. Vectors are
    # unit-normalized INSIDE the pin: one division per vector here
    # replaces a norm product per PAIR downstream (cosine becomes a
    # plain dot over the pair space, the dominant cost)
    from bloomy_etl_spark.functions.vectors import normalize

    assigned = pin(
        assigned.select(
            id_col, normalize(F.col(vec_col)).alias(vec_col), "cluster"
        ),
        eager=False,
    )
    pairs = _pairs_from_assigned(
        assigned, threshold, id_col, vec_col, normalized=True
    )
    # j has a lower-id near-dup (i) → j is dropped; the group's minimum
    # id is never any pair's j, so exactly one member per group survives
    dropped = pairs.select(F.col("j").alias("__drop_id")).distinct()
    return (
        assigned.select(F.col(id_col), "cluster")
        .join(
            dropped,
            assigned[id_col] == dropped["__drop_id"],
            "left",
        )
        .select(
            id_col, "cluster",
            F.col("__drop_id").isNull().alias("kept"),
        )
    )
