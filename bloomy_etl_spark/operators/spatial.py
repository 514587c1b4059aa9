"""Spatial joins over point sets: grid-cell-bucketed radius search.

The reference's spatial surface is AOI clipping and tile mosaicking
(``/root/reference/core/processor.py`` bbox intersection,
``core/merger.py`` tile merge).  This module adds the missing *join*
dimension — "which observations fall within distance r of each other" —
the primitive behind anomaly clustering, station cross-matching and
spatial dedup, which a naive engine writes as an O(n²) theta join.

Scale design
------------
``radius_self_join`` is the classic grid-file decomposition: with cell
width ≥ r, any pair within distance r lands in the same or an adjacent
cell, so candidate generation is an *equi* join on cell id — shuffle
volume O(n), per-task work proportional to local density, never a
BroadcastNestedLoopJoin (plan-tested).

Exactly-once without ``distinct()``: the probe side replicates each
point to its 3×3 cell neighborhood, the build side keeps each point in
its home cell only, and the join takes ``build.id < probe.id``.  A
qualifying pair (a<b) matches exactly when a's single home cell is one
of b's nine distinct probe cells — at most one equal cell id — so each
pair appears exactly once and no pair-level dedup shuffle is needed.

Skew: a pathological point pile-up (many points in one cell) expands
quadratically in that cell's task, the same hot-bucket reality as LSH
blocking; the remedy there (``dedup.bucket_pairs`` chunking) applies if
a dataset needs it — the cell join keeps the hot set addressable by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["radius_self_join"]


def radius_self_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
    *,
    cell: float | None = None,
) -> DataFrame:
    """All pairs of ``points`` with Euclidean distance ≤ ``radius``.

    Output columns: ``id_a < id_b``, ``dist2`` (squared distance —
    exact under integer coordinates, no float rounding in the
    predicate) and ``dist``.  ``cell`` (default = ``radius``) is the
    grid pitch; it must be ≥ ``radius`` for the 3×3 neighborhood to be
    exhaustive.
    """
    cw = float(cell if cell is not None else radius)
    if cw < radius:
        raise ValueError("radius_self_join: cell width must be >= radius")

    base = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.floor(F.col(x_col) / cw).cast("long").alias("__cx"),
        F.floor(F.col(y_col) / cw).cast("long").alias("__cy"),
    )
    build = base.select(
        F.col("__id").alias("id_a"),
        F.col("__x").alias("xa"),
        F.col("__y").alias("ya"),
        "__cx",
        "__cy",
    )
    off = F.sequence(F.lit(-1), F.lit(1))
    probe = base.select(
        F.col("__id").alias("id_b"),
        F.col("__x").alias("xb"),
        F.col("__y").alias("yb"),
        F.explode(
            F.flatten(
                F.transform(
                    off,
                    lambda dx: F.transform(
                        off,
                        lambda dy: F.struct(
                            (F.col("__cx") + dx).alias("cx"),
                            (F.col("__cy") + dy).alias("cy"),
                        ),
                    ),
                )
            )
        ).alias("__c"),
    ).select("id_b", "xb", "yb", F.col("__c.cx").alias("__cx"),
             F.col("__c.cy").alias("__cy"))

    dist2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        build.join(probe, ["__cx", "__cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist2 <= F.lit(radius) ** 2))
        .select(
            "id_a",
            "id_b",
            dist2.alias("dist2"),
            F.sqrt(dist2).alias("dist"),
        )
    )
