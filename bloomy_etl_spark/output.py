"""Presentation-order helper for the differential-compare protocol.

Every declared query ends in a deterministic sort so the driver's
row-hash comparison (and the DuckDB oracle's ORDER BY) see identical
sequences. That sort is PRESENTATION, not computation: no operator
semantics depend on it, and a production sink would not sort at all.

``presentation_sort`` implements it as a single-partition in-partition
sort instead of ``orderBy``:

  * ``orderBy`` is a global range sort — Spark first runs a separate
    boundary-*sampling job* over the input, then range-shuffles. On the
    bounded summary outputs these queries emit (daily roll-ups, per-group
    aggregates, top-k lists — thousands of rows at most) that sampling
    pass costs more than the whole sort, and it reruns on every
    execution. Measured at sf0.1: ~0.15-0.2 s per query, ~35 queries.
  * ``repartition(1)`` (default) is a plain hash shuffle to one
    partition — no sampling job — and, being a shuffle boundary, leaves
    every upstream stage at full parallelism. (A ``coalesce(1)`` would
    avoid even that one extra stage, but it narrows the final
    post-shuffle stage to ONE task — and for joins/windows that stage is
    where the real per-row work runs: measured 10x regressions on the
    pairwise-cosine and top-k-window queries. Only a caller that KNOWS
    its final stage merely merges partial aggregates should pass
    ``isolate=False``.)

Scale note: single-partition sorting is correct exactly because these
are summary outputs whose size is bounded by group cardinality, not by
input size. A query whose RESULT grows with the corpus (e.g. a
per-document export) should keep ``orderBy`` — the range sort IS Spark's
scalable ordering — or better, drop the sort and let the consumer order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def presentation_sort(df: DataFrame, *cols, isolate: bool = True) -> DataFrame:
    one = df.repartition(1) if isolate else df.coalesce(1)
    return one.sortWithinPartitions(*cols)
