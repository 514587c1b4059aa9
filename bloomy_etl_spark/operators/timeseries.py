"""Time-series regularization: bucketing, gap filling, interpolation.

The reference pipeline consumes *irregular* per-granule time series and
the downstream cube expects a *regular* grid (``/root/reference/core/
merger.py`` same-day merge produces at-most-daily frames; the viewer
assumes an ordered, gap-aware axis).  This module supplies the
hypertable-style primitives that turn an irregular observation stream
into a dense grid: ``time_bucket`` (stride alignment), and ``gapfill``
(dense grid + LOCF / linear interpolation / NULL padding).

Scale design — one shuffle, zero joins
--------------------------------------
The textbook gap-fill is a three-step plan: per-key ``min/max`` agg,
``sequence``-explode a calendar table, then left-join observations back
(two shuffles + a join whose left side is the *dense* grid — the most
rows the query will ever touch).  ``gapfill`` instead does one window
pass over the *sparse* observations (shuffle on the series key only):
``lead()`` brings the next observation onto each row, every row
map-side explodes exactly the grid slots it is responsible for —
``[t, next_t)`` — and the fill value is computed in-row from the two
bracketing observations.  The dense grid therefore only ever exists as
generator output inside the final map stage; nothing downstream
shuffles it.  A 100 TB corpus of sparse series pays for its observation
count, never for its grid size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_bucket", "gapfill", "ewma_last", "cusum_alerts",
           "time_weighted_avg"]


def time_bucket(step: int, t: Column | str) -> Column:
    """Align an integer time index to its containing ``step``-wide bucket.

    ``time_bucket(7, day)`` maps a day index to the first day of its
    7-day bucket — the integer-index analogue of TimescaleDB's
    ``time_bucket`` (floor division, exact, engine-portable).
    """
    c = F.col(t) if isinstance(t, str) else t
    return (F.floor(c / F.lit(step)) * F.lit(step)).cast("long")


def gapfill(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    value_col: str,
    *,
    step: int = 1,
    method: str = "linear",
    out_col: str | None = None,
) -> DataFrame:
    """Densify a sparse per-key series onto a regular integer grid.

    ``df`` must hold at most one row per ``(keys, time_col)`` — i.e. the
    caller has already bucketed/aggregated (see ``time_bucket``).
    ``time_col`` is an integer index (day number, bucket start, …); the
    output grid per key runs from that key's first to last observation
    in strides of ``step``, anchored at each observation (with
    observations aligned to ``step`` — the normal case after
    ``time_bucket`` — the grid is globally aligned).

    ``method``:
      * ``"locf"``   — last observation carried forward.
      * ``"linear"`` — linear interpolation between the bracketing
        observations (observed rows keep their value exactly).
      * ``"null"``   — grid slots added with NULL (shape-only densify).

    Output: ``keys + [time_col, out_col, "observed"]``.  No
    extrapolation ever happens: the grid starts and ends on real
    observations, so LOCF/linear are total on the grid.  A NULL
    *observed* value propagates through its span (garbage in stays
    visibly garbage — it is not silently bridged).
    """
    if method not in ("locf", "linear", "null"):
        raise ValueError(f"gapfill: unknown method {method!r}")
    out = out_col or value_col
    t, v = F.col(time_col), F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(time_col)
    nxt_t, nxt_v = F.lead(t).over(w), F.lead(v).over(w)

    # Each observation owns grid slots [t, next_t) — the last owns just
    # itself — so every slot is emitted exactly once per key, map-side.
    # (Window pass first, generator in a separate projection: Spark
    # forbids window expressions inside a generator's operator.)
    led = df.select(
        *keys,
        t.alias("__t"),
        v.alias("__v"),
        nxt_t.alias("__nt"),
        nxt_v.alias("__nv"),
    )
    # Stop clamped to >= start: two consecutive observations closer than
    # ``step`` (unbucketed input) would otherwise make sequence() raise
    # an opaque 'illegal sequence boundaries' error mid-job. Clamped,
    # the earlier observation emits just its own slot and the later one
    # still appears as its own grid row — off-grid inputs degrade to
    # densify-only instead of failing the job.
    span = F.sequence(
        F.col("__t"),
        F.greatest(
            F.col("__t"),
            F.coalesce(F.col("__nt") - F.lit(step), F.col("__t")),
        ),
        F.lit(step),
    )
    g = led.select(
        *keys, "__t", "__v", "__nt", "__nv", F.explode(span).alias(time_col)
    )
    d, t0, v0, t1, v1 = (
        F.col(time_col),
        F.col("__t"),
        F.col("__v"),
        F.col("__nt"),
        F.col("__nv"),
    )
    observed = d == t0
    if method == "locf":
        filled = v0
    elif method == "null":
        filled = F.when(observed, v0)
    else:  # linear
        filled = F.when(observed, v0).otherwise(
            v0 + (v1 - v0) * (d - t0) / (t1 - t0)
        )
    return g.select(*keys, d.alias(time_col), filled.alias(out),
                    observed.alias("observed"))


def ewma_last(series: DataFrame, alpha_den: int = 4,
              key_col: str = "user_id", ts_col: str = "eus",
              order_col: str = "event_id",
              val_col: str = "v") -> DataFrame:
    """Per-key exponential moving average (α = 1/``alpha_den``) in
    EXACT integer arithmetic — the standard stream-smoothing signal
    (load baselines, rate smoothing, anomaly references), computed so a
    sequential engine replays it bit-identically.

    The recurrence is the non-negative form ``s₁ = v₁;
    sᵢ = (αd−1)·sᵢ₋₁ + vᵢ) div αd`` (truncating division — numerator
    never negative for non-negative inputs, so truncation ≡ floor in
    every engine; the subtraction form ``s + (v−s)/αd`` would hit the
    engines' divergent negative-division conventions). Values must be
    pre-quantized integers (the ``v_e4`` convention).

    Shape: ONE key-keyed shuffle; each key's observations collect into
    a sorted in-row array (bounded-actor assumption, q84/q140) and a
    single ``aggregate`` fold walks it. EWMA is order-sensitive by
    definition — no associative decomposition exists — so the fold IS
    the distributed form: keys parallelize, the per-key walk is
    sequential exactly like the semantics.

    Returns ``(key, n_obs, last_v, ewma)`` — all int64.
    """
    if alpha_den < 2:
        raise ValueError("alpha_den must be ≥ 2 (α = 1/alpha_den < 1)")
    seq = series.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(ts_col, order_col, val_col))
        ).alias("__seq")
    )
    init = F.lit(-1).cast("long")
    m = F.lit(alpha_den - 1).cast("long")
    d = F.lit(alpha_den).cast("long")

    def _step(acc, e):
        v = e[val_col]
        nxt = (m * acc + v) - (m * acc + v) % d
        return F.when(acc < 0, v).otherwise((nxt / d).cast("long"))

    last = F.element_at(F.col("__seq"), -1)[val_col]
    return seq.select(
        key_col,
        F.size("__seq").cast("long").alias("n_obs"),
        last.alias("last_v"),
        F.aggregate(F.col("__seq"), init, _step).alias("ewma"),
    )


def cusum_alerts(series: DataFrame, drift: int, threshold: int,
                 key_col: str = "user_id", ts_col: str = "eus",
                 order_col: str = "event_id",
                 val_col: str = "v",
                 enc: int = 10 ** 12) -> DataFrame:
    """Per-key one-sided CUSUM change detection in EXACT integer
    arithmetic — the classic sequential drift detector (Page 1954):
    ``s ← max(0, s + (v − drift))``, and every time ``s`` reaches
    ``threshold`` an alert fires and the accumulator resets.  The
    monitoring counterpart to :func:`ewma_last`: EWMA smooths the
    level, CUSUM *detects sustained upward shifts* (traffic bursts,
    cost regressions, abuse spikes) with provably bounded detection
    delay.

    The fold state packs ``(n_alerts, s)`` into ONE int64 —
    ``state = n_alerts·enc + s`` — so the recurrence stays a plain
    integer ``aggregate`` fold that a sequential engine (the DuckDB
    oracle's ``list_reduce``) replays bit-identically.  Requires
    ``threshold + max(v) < enc`` and ``n_alerts < 2⁶³/enc`` (9.2 M at
    the default), both loose at the v_e4 quantization this corpus
    uses.

    Shape: identical to :func:`ewma_last` — ONE key-keyed shuffle,
    per-key sorted in-row array, one fold.  CUSUM is order-sensitive
    by definition (no associative decomposition), so keys parallelize
    and the per-key walk is sequential exactly like the semantics.
    The recurrence composes across batches (fold B from A's final
    state ≡ fold A∥B), which is what the streaming ingest
    (``streaming/ingest.py::streaming_cusum_ingest``) relies on.

    Returns ``(key, n_obs, n_alerts, resid)`` — all int64; ``resid``
    is the accumulator value after the last observation (distance
    already travelled toward the next alert).
    """
    if drift < 0 or threshold <= 0:
        raise ValueError("drift must be ≥ 0 and threshold > 0")
    if threshold >= enc:
        raise ValueError("threshold must be < enc (state packing)")
    seq = series.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct(ts_col, order_col, val_col))
        ).alias("__seq")
    )
    k = F.lit(drift).cast("long")
    h = F.lit(threshold).cast("long")
    m = F.lit(enc).cast("long")

    def _step(acc, e):
        s = acc % m
        t = F.greatest(s + e[val_col] - k, F.lit(0).cast("long"))
        return F.when(t >= h, acc - s + m).otherwise(acc - s + t)

    state = F.aggregate(F.col("__seq"), F.lit(0).cast("long"), _step)
    # Unpack with integer DIV/%, never float division — alerts·enc can
    # exceed 2⁵³ where a double round-trip would silently drift.
    return (
        seq.select(
            key_col,
            F.size("__seq").cast("long").alias("n_obs"),
            state.alias("__st"),
        )
        .select(
            key_col,
            "n_obs",
            F.expr(f"__st DIV CAST({enc} AS BIGINT)").alias("n_alerts"),
            (F.col("__st") % m).alias("resid"),
        )
    )


def time_weighted_avg(series: DataFrame, key_col: str = "user_id",
                      ts_col: str = "eus", order_col: str = "event_id",
                      val_col: str = "v") -> DataFrame:
    """Per-key time-weighted average over an IRREGULAR series — the
    hypertable aggregate (TimescaleDB's ``time_weight('LOCF', …)``)
    that a plain AVG gets wrong whenever sampling is uneven: a sensor
    that reports 100 all day and 0 for one second averages ~100, not
    50.  Each observation holds (LOCF) until the next one; the result
    is ``∫v dt / (t_last − t_first)`` in exact integer arithmetic:
    ``twa = Σ vᵢ·(tᵢ₊₁−tᵢ) DIV span``.

    Overflow posture: interval widths are quantized from µs to
    MILLISECONDS before the multiply (``(tᵢ₊₁−tᵢ) DIV 1000``, floor on
    non-negative — identical in every engine), because µs widths times
    e4-quantized values can exceed 2⁶³ on a month-long span; at ms
    grain the headroom is ~700×.  The denominator is the SUM of the
    quantized widths (not the raw span), so the ratio stays an exact
    integer identity.

    Degenerate keys (zero total quantized width: one observation, one
    instant, or all gaps under 1 ms) fall back to the LAST value in
    order — the LOCF limit of the integral.  Ties in ``ts_col`` order
    by ``order_col``; earlier tie rows carry zero width, so both
    engines walk the identical weighting.

    Shape: one key-keyed shuffle; the ``lead`` window and the final
    aggregate ride the SAME partitioning (plan-pinned ≤ 2 exchanges
    with the presentation sort).  Returns
    ``(key, n_obs, span_us, twa)`` — all int64.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    gap = F.coalesce(F.lead(ts_col).over(w) - F.col(ts_col), F.lit(0))
    led = series.select(key_col, ts_col, order_col, val_col).withColumn(
        "__w", ((gap - gap % 1000) / 1000).cast("long")
    )
    g = led.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        (F.max(ts_col) - F.min(ts_col)).cast("long").alias("span_us"),
        F.sum(F.col("__w")).cast("long").alias("__wsum"),
        F.sum(F.col(val_col) * F.col("__w")).cast("long").alias("__area"),
        F.max_by(
            F.col(val_col), F.struct(F.col(ts_col), F.col(order_col))
        ).alias("__last"),
    )
    return g.select(
        key_col,
        "n_obs",
        "span_us",
        F.when(F.col("__wsum") > 0, F.expr("__area DIV __wsum"))
        .otherwise(F.col("__last")).cast("long").alias("twa"),
    )
