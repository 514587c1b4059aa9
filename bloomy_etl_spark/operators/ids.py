"""Distributed sequential ID assignment: global row numbers at scale.

``ROW_NUMBER() OVER (ORDER BY …)`` with no PARTITION BY is the classic
scale trap: Spark executes it as a single-task window — one executor
numbers 100 TB.  ``monotonically_increasing_id`` scales but is neither
contiguous nor stable.  This module does the canonical two-pass
instead:

1. range-repartition + in-partition sort on the total order (the same
   machinery as ``sinks/layout.py::write_range_sorted``) — partitions
   now hold disjoint, ordered ranges;
2. one tiny job counts rows per partition; the driver turns counts
   into cumulative offsets (O(#partitions) scalars — the k-means-
   centroid posture);
3. an Arrow-batched ``mapInPandas`` enumerates each partition locally
   and adds its offset — zero further shuffles.

With a TOTAL order (ties fully broken) the assigned ids equal the
global rank regardless of where the sampled range boundaries land, so
the result is deterministic and oracle-checkable against ROW_NUMBER
(t2:q92).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin as _pin

__all__ = ["assign_sequential_ids"]


def assign_sequential_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    *,
    id_col: str = "seq_id",
    start: int = 1,
    pin: bool = True,
) -> DataFrame:
    """Add ``id_col``: contiguous longs ``start, start+1, …`` in
    ``order_cols`` order.  ``order_cols`` must be a total order (break
    ties with a unique column) for the ids to be deterministic.

    ``pin`` pins the sorted partitions between the count job and the
    numbering job (spill-safe), so the range boundaries both jobs see
    are physically identical — which REQUIRES a non-recomputable pin
    (``session.pin``: localCheckpoint, or reliable checkpoint on a
    cluster with a checkpoint dir; a recomputable persist could
    reassign ids on a lost block). ``pin=False`` skips the pin and relies
    on Spark's deterministic re-execution (range sampling is seeded per
    partition index) — correct for deterministic inputs, cheaper for
    huge one-shot exports."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (need a total order)")
    cols = [F.col(c) for c in order_cols]
    ordered = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
    ordered = ordered.withColumn("__pid", F.spark_partition_id())
    if pin:
        ordered = _pin(ordered, eager=True)

    counts = {
        r["__pid"]: r["n"]
        for r in ordered.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    offsets, acc = {}, int(start)
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql import types as T

    in_cols = [f.name for f in df.schema.fields]
    # fresh StructType — StructType.add mutates the receiver in place
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(id_col, T.LongType())]
    )

    def number(batches: Iterator) -> Iterator:
        base = None
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf[in_cols].copy()
            out[id_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield out

    return ordered.mapInPandas(number, schema=out_schema)
