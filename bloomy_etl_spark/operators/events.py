"""Event detection over the merged NDVI time series (reference parity).

Reference: ``EventDetector.detect_events``
(``/root/reference/core/quality.py:105-181``) — three event families over
the per-timestamp spatial-mean NDVI series (SURVEY W1-W3):

  * abrupt_drops — diff from previous < abrupt_drop threshold, no
    recovery: ``possible_fire_or_harvest``; at the series edge (no next
    point): ``recent_event``;
  * anomalies — same drop but next point recovers by more than
    recovery_threshold: ``transient_anomaly``;
  * sustained_changes — three consecutive values below sustained_low
    after a value above sustained_high_before three steps back.

Scale: the window input is the per-timestamp aggregate (one row per
timestamp), produced by a distributed hash-agg over the pixel table. The
unpartitioned ORDER BY time window is safe because a century of daily
timestamps is ~40k rows; for many independent series, pass
``partition_cols`` (e.g. per AOI / per tile).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloomy_etl_spark.functions.indices import DEFAULT_QUALITY, QualityThresholds


def single_series_key(time_col: str) -> F.Column:
    """Constant partition key for an intentionally-single-partition window
    over one bounded series (the post-aggregate daily table). A plain
    ``F.lit(0)`` is constant-folded out of the window spec, resurrecting
    the empty partition spec and its WindowExec warning — deriving the
    constant from the (non-null) order column survives optimization while
    executing identically. Multi-series callers pass ``partition_cols``
    instead and parallelize per series."""
    return F.year(time_col) * 0


def ndvi_series(merged: DataFrame) -> DataFrame:
    """Per-timestamp spatial mean NDVI (quality.py:118-121): nanmean →
    null-skipping avg. Emits (time, date, v)."""
    return merged.groupBy("time").agg(F.avg("ndvi").alias("v")).select(
        "time", F.date_format("time", "yyyy-MM-dd").alias("date"), "v"
    )


def detect_events(
    series: DataFrame,
    q: QualityThresholds = DEFAULT_QUALITY,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Unified events frame with ``event_kind`` discriminator
    (SURVEY §1.1 "Event records"): one row per detected event, schema
    (event_kind, date, start_date, end_date, ndvi_before, ndvi_during,
    ndvi_after, drop_mag, ndvi_sustained, event_type).

    NULL fidelity: a NULL series value (all-masked timestamp; NaN in the
    reference) disables any comparison it feeds, exactly like NaN does in
    NumPy — except the sustained-change frame, where Spark's null-skipping
    MAX would differ from ``all(...)`` over NaN; the ``count = 3`` guard
    restores the reference behavior.
    """
    # Single-series window when no partition_cols (see single_series_key);
    # input is the per-timestamp aggregate — one row per day, bounded.
    part = list(partition_cols)
    key = part if part else [single_series_key("time")]
    w = Window.partitionBy(*key).orderBy("time")
    frame3 = w.rowsBetween(-2, 0)

    x = series.select(
        *part,
        "time",
        "date",
        "v",
        F.lag("v", 1).over(w).alias("v_prev"),
        F.lead("v", 1).over(w).alias("v_next"),
        F.lag("date", 2).over(w).alias("date_m2"),
        F.lag("v", 3).over(w).alias("v_m3"),
        F.max("v").over(frame3).alias("max3"),
        F.avg("v").over(frame3).alias("avg3"),
        F.count("v").over(frame3).alias("cnt3"),
        # last row of the series = no successor in the ordered window — a
        # lead() in the SAME window pass, not a second all-rows count.
        F.lead("time", 1).over(w).isNull().alias("is_last"),
    )

    diff = F.col("v") - F.col("v_prev")
    recovery = F.col("v_next") - F.col("v")
    dropped = diff < q.abrupt_drop
    nulls = F.lit(None).cast("string")
    nulld = F.lit(None).cast("double")

    # One event struct per family, all with the identical field layout so
    # they can share one array. A filter-per-family + union would execute
    # the ENTIRE upstream chain (at q25 that is the full pixel→merge cube
    # DAG) once per family — column pruning projects each branch
    # differently, so neither Catalyst nor AQE can reuse the exchanges.
    # Building the up-to-3 candidate structs in-row and exploding keeps
    # detection a single pass over a single window stage.
    anomaly = F.struct(
        F.lit("anomaly").alias("event_kind"),
        F.col("date").alias("date"),
        nulls.alias("start_date"),
        nulls.alias("end_date"),
        F.col("v_prev").alias("ndvi_before"),
        F.col("v").alias("ndvi_during"),
        F.col("v_next").alias("ndvi_after"),
        nulld.alias("drop_mag"),
        nulld.alias("ndvi_sustained"),
        F.lit("transient_anomaly").alias("event_type"),
    )
    # Reference records ndvi_after = the dropped value itself for
    # abrupt_drops (quality.py:143) — "after the event began".
    abrupt = F.struct(
        F.lit("abrupt_drop").alias("event_kind"),
        F.col("date").alias("date"),
        nulls.alias("start_date"),
        nulls.alias("end_date"),
        F.col("v_prev").alias("ndvi_before"),
        nulld.alias("ndvi_during"),
        F.col("v").alias("ndvi_after"),
        F.abs(diff).alias("drop_mag"),
        nulld.alias("ndvi_sustained"),
        F.when(F.col("is_last"), "recent_event")
        .otherwise("possible_fire_or_harvest")
        .alias("event_type"),
    )
    sustained = F.struct(
        F.lit("sustained_change").alias("event_kind"),
        nulls.alias("date"),
        F.col("date_m2").alias("start_date"),
        F.col("date").alias("end_date"),
        F.col("v_m3").alias("ndvi_before"),
        nulld.alias("ndvi_during"),
        nulld.alias("ndvi_after"),
        nulld.alias("drop_mag"),
        F.col("avg3").alias("ndvi_sustained"),
        F.lit("sustained_change").alias("event_type"),
    )
    candidates = F.array(
        F.when(dropped & ~F.col("is_last") & (recovery > q.recovery_threshold), anomaly),
        F.when(
            dropped
            & (
                F.col("is_last")
                | ~F.coalesce(recovery > q.recovery_threshold, F.lit(False))
            ),
            abrupt,
        ),
        F.when(
            (F.col("cnt3") == 3)
            & (F.col("max3") < q.sustained_low)
            & (F.col("v_m3") > q.sustained_high_before),
            sustained,
        ),
    )
    fired = F.filter(candidates, lambda e: e.isNotNull())
    return x.select(*part, F.explode(fired).alias("_e")).select(*part, "_e.*")
