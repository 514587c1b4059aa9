"""Golden-record survivorship: collapse entity observations to one row.

The last step of entity resolution: after duplicates are clustered
(exact digests — ``dedup.exact_duplicates``; near-dup connected
components — ``dedup.resolve_clusters``), each cluster's observations
must merge into ONE canonical record under field-level rules — the
MDM "survivorship" step. Each field independently picks its survivor:
most recent, most frequent, extremum, or an aggregate.

Scale design: all non-frequency rules evaluate in a SINGLE hash
aggregate over the cluster key (``max_by``/``min_by`` carry the
survivor through the map-side combine — no sort, no window).
Frequency (mode) rules need value-level counts first, so each mode
column adds one two-level pre-aggregation joined back BY KEY; ties
break deterministically (higher count, then larger value) so replays
and engines agree.  Nothing is collected; output is one row per
entity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_record"]

_SIMPLE = {"max", "min", "sum", "count", "count_distinct"}


def golden_record(
    df: DataFrame,
    keys: Sequence[str],
    rules: dict[str, tuple],
) -> DataFrame:
    """One canonical row per ``keys`` group under field-level rules.

    ``rules`` maps output column → rule tuple:
      * ``("latest", col, order_col)``   — value of ``col`` on the row
        maximizing ``order_col`` (pass a struct-worthy tuple of columns
        via ``("latest", col, (o1, o2))`` for a deterministic tiebreak);
      * ``("earliest", col, order_col)`` — ditto, minimizing;
      * ``("mode", col)``                — most frequent value (ties:
        larger value), NULLs ignored;
      * ``("max"|"min"|"sum"|"count"|"count_distinct", col)``.
    """
    if not rules:
        raise ValueError("golden_record: no rules")
    keys = list(keys)
    aggs, modes = [], []
    for out, rule in rules.items():
        kind = rule[0]
        if kind in ("latest", "earliest"):
            _, col, order = rule
            ords = [order] if isinstance(order, str) else list(order)
            ostruct = F.struct(*[F.col(o) for o in ords])
            fn = F.max_by if kind == "latest" else F.min_by
            aggs.append(fn(F.col(col), ostruct).alias(out))
        elif kind == "mode":
            modes.append((out, rule[1]))
        elif kind in _SIMPLE:
            col = rule[1]
            fn = {
                "max": F.max, "min": F.min, "sum": F.sum,
                "count": F.count, "count_distinct": F.count_distinct,
            }[kind]
            aggs.append(fn(F.col(col)).alias(out))
        else:
            raise ValueError(f"golden_record: unknown rule {rule!r}")
    base = (
        df.groupBy(*keys).agg(*aggs)
        if aggs
        else df.select(*keys).distinct()
    )
    for out, col in modes:
        counted = (
            df.filter(F.col(col).isNotNull())
            .groupBy(*keys, col)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy(*keys)
            .agg(
                F.max_by(
                    F.col(col), F.struct(F.col("__cnt"), F.col(col))
                ).alias(out)
            )
        )
        base = base.join(counted, keys, "left")
    return base
