"""Watermarked stream-stream joins: correlate two unbounded streams with
bounded state.

The canonical use in a training-data ingest mesh: correlate a document
stream with its late-arriving annotations (or impressions with clicks,
requests with responses). A plain join of two streams would need
unbounded state — every row might match a future row. The standard
solution (Spark's stream-stream join semantics): watermark BOTH sides
and constrain the join with an event-time range, so the state store can
evict rows once no future match is possible. State per side is bounded
by (watermark horizon + range span) × arrival rate — independent of
stream length; keyed state shuffles on the equi key exactly like a
batch join, so the plan scales by adding executors.

Inner joins emit as matches arrive; ``how="left_outer"`` additionally
emits unmatched left rows once the watermark passes their range (the
"click never came" rows — exactly the rows an ingest monitor alerts on).

Batch equivalence is the verification story (as everywhere in
``streaming/``): the same join spec run as a plain batch join over the
full corpus yields the same matched pairs (unit-tested, inner and
left-outer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    watermark: str = "10 minutes",
    max_lag: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``on`` where the right event
    arrives within ``[left_time, left_time + max_lag]``.

    Both sides are watermarked with ``watermark`` (how late a row may
    be); ``max_lag`` is the causal window (how long after the left
    event a matching right event can occur). Both bounds are REQUIRED
    for state eviction — omit either and Spark must keep every row
    forever. Works identically on batch DataFrames (the range condition
    is an ordinary predicate), which is how the tests pin equivalence.

    Columns are disambiguated with ``l_``/``r_`` prefixes (except the
    shared key), so downstream code never hits ambiguous-attribute
    errors — the join emits ``(on, l_*, r_*)``.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    lw = left.withWatermark(left_time, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_time, watermark) if right.isStreaming else right
    lp = lw.select(
        F.col(on),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != on],
    )
    rp = rw.select(
        F.col(on).alias("__rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    cond = (
        (lp[on] == rp["__rk"])
        & (rp[f"r_{right_time}"] >= lp[f"l_{left_time}"])
        & (
            rp[f"r_{right_time}"]
            <= lp[f"l_{left_time}"] + F.expr(f"INTERVAL {max_lag}")
        )
    )
    return lp.join(rp, cond, how).drop("__rk")
