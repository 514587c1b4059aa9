"""Slowly-changing-dimension (SCD type-2) history building.

Turns a row-grain change log (entity, event-time, tracked attribute)
into the interval-grain *history table* a warehouse serves lookups
from: one row per run of consecutive equal attribute values, carrying
``[valid_from, valid_to)`` validity and a per-entity version number —
the standard Kimball SCD2 shape, and the asset an AS-OF join
(``operators/relational.py``) probes.  The reference engine exposes
the row-grain event log only (``/root/reference/core/events.py``
change classification); the compacted interval view is the missing
half that makes point-in-time queries O(runs) instead of O(rows).

Complement, not duplicate, of ``sinks/layout.py::scd2_apply`` (q75):
``scd2_apply`` MERGES a batch of observations into an existing
dimension (the incremental upsert path); ``scd2_compact`` REBUILDS the
interval table from the raw log in one pass (the backfill / bootstrap
path, and the oracle-checkable ground truth the upsert must converge
to).  Both produce the same half-open interval grain.

Scale design — one shuffle, reused three times
----------------------------------------------
The gaps-and-islands plan is window-only: a ``lag`` change flag, a
running ``sum`` to number runs, and the run-grain aggregate all
partition by the SAME entity key, so Catalyst plans ONE hash
exchange and runs every pass on the sorted partitions it already has
(plan-pinned in ``tests/test_plans.py``).  No self-join, no
calendar explode — a 100 TB change log pays one shuffle of itself,
and the output is bounded by the number of *changes*, which is the
compression that makes dimension history cheap to serve.

Validity convention: half-open ``[valid_from, valid_to)`` in event
time; the live run's ``valid_to`` is NULL.  Exactly-equal timestamps
are ordered by the tie-break column so replays are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_compact"]


def scd2_compact(log: DataFrame, key_col: str = "user_id",
                 ts_col: str = "eus", order_col: str = "event_id",
                 attr_col: str = "state") -> DataFrame:
    """Compact a change log into SCD2 validity intervals.

    Consecutive rows (per ``key_col``, ordered by ``(ts_col,
    order_col)``) holding the same ``attr_col`` collapse into one
    interval row.  Returns::

        (key, version, attr, valid_from, valid_to, n_rows)

    ``version`` numbers runs 1.. per key in time order; ``valid_from``
    is the run's first event time, ``valid_to`` the NEXT run's
    ``valid_from`` (NULL for the key's current run); ``n_rows`` counts
    the source rows the run absorbed (the audit column that makes the
    compaction checkable against the log).
    """
    w_row = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    a = F.col(attr_col)
    # Two projections (Spark forbids a window inside a window), both on
    # the SAME partitioning — one physical exchange.
    flagged = log.select(
        key_col, ts_col, order_col, attr_col
    ).withColumn(
        "__chg",
        F.when(
            F.lag(a).over(w_row).isNull() | (F.lag(a).over(w_row) != a),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn(
        "__v",
        F.sum("__chg").over(
            w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    grain = runs.groupBy(key_col, "__v").agg(
        F.first(a).alias(attr_col),
        F.min(F.col(ts_col)).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    w_run = Window.partitionBy(key_col).orderBy(F.col("__v").asc())
    return grain.select(
        F.col(key_col),
        F.col("__v").cast("long").alias("version"),
        F.col(attr_col),
        F.col("valid_from"),
        F.lead("valid_from").over(w_run).alias("valid_to"),
        F.col("n_rows"),
    )
