"""Materialized aggregate views: build, incremental refresh, rewrite.

The lakehouse answer to "the same rollup is computed every morning over
100 TB": persist the aggregate once at a chosen grain, keep it current
by folding in new batches (never recomputing history), and answer any
query AT OR ABOVE that grain from the view instead of the base table.
The algebra is the mergeable-state monoid of ``operators/incremental.py``
(count / sum / min / max / sum-of-squares per measure), generalized to
multiple measures and wired to a rewrite rule.

Why this shape at scale
-----------------------
* The view stores PARTIAL STATES, not finalized values — so any coarser
  grouping re-aggregates exactly (``avg``/``stddev_pop`` finalize from
  merged sums; a view of finalized averages could not be re-averaged).
* Refresh is append-only per batch: one ``partitionBy(batch_id)``
  dynamic overwrite makes re-delivered batches idempotent (same id →
  same partition replaced, never doubled) — the txlog/rollup-store
  posture without a coordinator.
* Rewrite legality is static metadata: a query is answerable iff its
  group keys ⊆ view keys, its filter columns ⊆ view keys (filters on
  grouped-out columns would need base rows), and its measures derive
  from stored states.  The rewritten plan scans ``|groups|`` rows
  instead of ``|base|`` — the entire point at 100 TB — and an optional
  key partitioning of the view gives partition pruning on top.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin

__all__ = [
    "AggQuery",
    "streaming_matview_sink",
    "build_state",
    "answer_from_state",
    "create_matview",
    "refresh_matview",
    "matview_meta",
    "matview_state",
    "can_answer",
    "answer_from_matview",
    "answer_direct",
    "answer",
    "compact_matview",
]

_FNS = frozenset(
    {"count_rows", "count", "sum", "min", "max", "avg", "stddev_pop",
     "approx_count_distinct", "approx_percentile"}
)
# codegen bound for the inline per-bin sum expressions in build_state
_MAX_PCTL_BINS = 512
_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(list(v)),
}


@dataclass(frozen=True)
class AggQuery:
    """Declarative aggregate query: GROUP BY ``keys``, computing
    ``measures`` (out_name → (fn, col); col None for ``count_rows``;
    fn ``approx_count_distinct`` needs the col in the view's
    ``approx_distinct_cols`` — served from the mergeable HLL sketch;
    fn ``approx_percentile`` is the 3-tuple (fn, col, q) and needs the
    col in the view's ``percentile_cols`` — served from the mergeable
    histogram state with value error ≤ one bin width), under
    conjunctive ``filters`` ((col, op, value), op ∈ = != < <= > >=
    in).  The spec form is what makes rewrite legality checkable."""

    keys: tuple[str, ...]
    measures: dict[str, tuple]
    filters: tuple[tuple[str, str, object], ...] = field(default_factory=tuple)

    def validate(self) -> None:
        for out, m in self.measures.items():
            fn, col, q = _mfc(m)
            if fn not in _FNS:
                raise ValueError(f"measure {out}: unknown fn {fn!r}")
            if (col is None) != (fn == "count_rows"):
                raise ValueError(f"measure {out}: col must be set iff fn"
                                 " is not count_rows")
            if fn == "approx_percentile":
                if q is None or not 0.0 <= q <= 1.0:
                    raise ValueError(f"measure {out}: approx_percentile "
                                     f"needs (fn, col, q) with q in [0,1]")
            elif len(m) != 2:
                raise ValueError(f"measure {out}: {fn} takes (fn, col)")
        for col, op, _ in self.filters:
            if op not in _OPS:
                raise ValueError(f"filter on {col}: unknown op {op!r}")


def _mfc(m: tuple) -> tuple[str, str | None, float | None]:
    """Normalize a measure tuple: (fn, col) or (fn, col, q) → (fn, col, q)."""
    return (m[0], m[1], m[2] if len(m) > 2 else None)


def _sc(prefix: str, col: str) -> str:
    return f"{prefix}__{col}"


def build_state(df: DataFrame, keys: Sequence[str],
                 measure_cols: Sequence[str],
                 approx_distinct_cols: Sequence[str] = (),
                 percentile_cols: dict[str, Sequence[float]] | None = None,
                 ) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("nr")]
    for c in measure_cols:
        cc = F.col(c)
        aggs += [
            F.count(cc).alias(_sc("n", c)),
            F.sum(cc).cast("double").alias(_sc("s", c)),
            F.min(cc).cast("double").alias(_sc("mn", c)),
            F.max(cc).cast("double").alias(_sc("mx", c)),
            F.sum(cc * cc).cast("double").alias(_sc("ssq", c)),
        ]
    # distinct counts are the one measure plain sums cannot re-aggregate
    # (distinct-of-parts ≠ sum of parts): store a mergeable DataSketches
    # HLL per group instead — union-at-read gives coarser grains and
    # batch merges the right answer to ~1%
    for c in approx_distinct_cols:
        aggs.append(F.hll_sketch_agg(F.col(c)).alias(_sc("hll", c)))
    # quantiles are the OTHER non-reaggregable measure (median-of-parts
    # ≠ median, and percentile_approx state isn't storable): keep a
    # mergeable equi-width histogram per group (operators/sketches.py
    # semantics — exact under/overflow tails, observed min/max). Inline
    # per-bin conditional sums keep the whole state ONE aggregation.
    for c, (lo, hi, nb) in (percentile_cols or {}).items():
        from bloomy_etl_spark.operators.sketches import hist_bin_col

        lo, hi, nb = float(lo), float(hi), int(nb)
        v = F.col(c).cast("double")
        b = hist_bin_col(v, lo, hi, nb)
        one = F.lit(1).cast("long")
        zero = F.lit(0).cast("long")
        aggs += [
            F.array(*[F.sum(F.when(b == i, one).otherwise(zero))
                      for i in range(nb)]).alias(_sc("ph", c)),
            F.sum(F.when(b == -1, one).otherwise(zero)).alias(_sc("phu", c)),
            F.sum(F.when(b == nb, one).otherwise(zero)).alias(_sc("pho", c)),
            F.min(v).alias(_sc("pmn", c)),
            F.max(v).alias(_sc("pmx", c)),
            F.count(v).alias(_sc("pn", c)),
        ]
    return df.groupBy(*keys).agg(*aggs)


def _merge_state(state: DataFrame, keys: Sequence[str],
                 measure_cols: Sequence[str],
                 approx_distinct_cols: Sequence[str] = (),
                 percentile_cols: dict[str, Sequence[float]] | None = None,
                 ) -> DataFrame:
    aggs = [F.sum("nr").alias("nr")]
    for c in measure_cols:
        aggs += [
            F.sum(_sc("n", c)).alias(_sc("n", c)),
            F.sum(_sc("s", c)).alias(_sc("s", c)),
            F.min(_sc("mn", c)).alias(_sc("mn", c)),
            F.max(_sc("mx", c)).alias(_sc("mx", c)),
            F.sum(_sc("ssq", c)).alias(_sc("ssq", c)),
        ]
    for c in approx_distinct_cols:
        aggs.append(F.hll_union_agg(_sc("hll", c)).alias(_sc("hll", c)))
    pcols = list((percentile_cols or {}))
    for c in pcols:
        aggs += [
            F.collect_list(_sc("ph", c)).alias(_sc("phl", c)),
            F.sum(_sc("phu", c)).alias(_sc("phu", c)),
            F.sum(_sc("pho", c)).alias(_sc("pho", c)),
            F.min(_sc("pmn", c)).alias(_sc("pmn", c)),
            F.max(_sc("pmx", c)).alias(_sc("pmx", c)),
            F.sum(_sc("pn", c)).alias(_sc("pn", c)),
        ]
    merged = state.groupBy(*keys).agg(*aggs)
    for c in pcols:  # element-wise fold of the collected per-batch arrays
        lst = F.col(_sc("phl", c))
        fold = F.aggregate(
            lst,
            F.transform(F.element_at(lst, 1), lambda x: F.lit(0).cast("long")),
            lambda acc, h: F.zip_with(acc, h, lambda a, b2: a + b2),
        )
        merged = merged.withColumn(_sc("ph", c), fold).drop(_sc("phl", c))
    return merged


def _meta_path(path: str) -> str:
    return os.path.join(path, "_mv_meta.json")


def create_matview(
    df: DataFrame,
    keys: Sequence[str],
    measure_cols: Sequence[str],
    path: str,
    *,
    approx_distinct_cols: Sequence[str] = (),
    percentile_cols: dict[str, Sequence[float]] | None = None,
    partition_by: Sequence[str] = (),
) -> None:
    """Materialize partial states of ``df`` at grain ``keys`` for every
    column in ``measure_cols``.  ``partition_by`` (⊆ keys) lays the view
    out for partition pruning on those keys.  ``percentile_cols`` maps
    col → (lo, hi, n_bins): those columns additionally store a mergeable
    histogram so ``approx_percentile`` measures answer from the view
    with value error ≤ (hi−lo)/n_bins.  The initial load is batch 0 of
    the refresh log."""
    if not set(partition_by) <= set(keys):
        raise ValueError("partition_by must be a subset of keys")
    percentile_cols = dict(percentile_cols or {})
    for c, (lo, hi, nb) in percentile_cols.items():
        if not float(hi) > float(lo):
            raise ValueError(f"percentile col {c}: need hi > lo")
        if not 1 <= int(nb) <= _MAX_PCTL_BINS:
            raise ValueError(
                f"percentile col {c}: n_bins must be in [1, {_MAX_PCTL_BINS}]")
    state = build_state(
        df, keys, measure_cols, approx_distinct_cols, percentile_cols
    ).withColumn("batch_id", F.lit(0))
    (
        state.write.mode("overwrite")
        .partitionBy("batch_id", *partition_by)
        .parquet(path)
    )
    meta = {
        "keys": list(keys),
        "measure_cols": list(measure_cols),
        "approx_distinct_cols": list(approx_distinct_cols),
        "percentile_cols": {c: [float(lo), float(hi), int(nb)]
                            for c, (lo, hi, nb) in percentile_cols.items()},
        "partition_by": list(partition_by),
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)


def refresh_matview(df_batch: DataFrame, path: str, batch_id: int) -> None:
    """Fold one new batch into the view.  Idempotent per ``batch_id``:
    the batch's states land in their own partition via dynamic
    overwrite, so an at-least-once redelivery replaces rather than
    doubles (same contract as ``incremental_store``, enforced by
    layout instead of by exclusion)."""
    if int(batch_id) <= 0:
        raise ValueError("batch_id must be positive (0 is the initial load)")
    meta = matview_meta(path)
    state = build_state(df_batch, meta["keys"], meta["measure_cols"],
                        meta.get("approx_distinct_cols", ()),
                        meta.get("percentile_cols") or None)
    spark = df_batch.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            state.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id", *meta["partition_by"])
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def streaming_matview_sink(stream: DataFrame, path: str,
                           checkpoint_dir: str):
    """Live materialized view: every micro-batch folds into the view
    via :func:`refresh_matview` with ``batch_id = epoch + 1`` (the
    initial ``create_matview`` load owns batch 0).  Exactly-once per
    epoch without a coordinator: a crashed epoch replays under the SAME
    id and the dynamic-overwrite idempotency replaces its partition
    instead of doubling it — the ``streaming_rollup_ingest`` posture,
    pointed at the multi-measure rewrite-capable view."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        refresh_matview(batch, path, int(epoch_id) + 1)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_matview(spark: SparkSession, path: str) -> int:
    """Fold every refresh batch into a single batch-0 state and rewrite
    the view. Each ``refresh_matview`` adds one ``batch_id`` partition;
    after thousands of refreshes the read-side merge pays for all of
    them — compaction restores O(groups) read cost. State merging is
    the monoid, so answers are bit-identical before and after (tested).

    Returns the number of batch partitions folded. Single-writer: run
    from the same maintenance job that issues refreshes (a refresh
    landing DURING the rewrite would be lost with it); afterwards,
    refresh ids may restart anywhere > 0 — idempotent redelivery only
    needs ids not to collide going forward, which epoch-derived ids
    (``streaming_matview_sink``) never do."""
    meta = matview_meta(path)
    raw = spark.read.parquet(path)
    n_batches = raw.select("batch_id").distinct().count()
    merged = _merge_state(
        raw.drop("batch_id"), meta["keys"], meta["measure_cols"],
        meta.get("approx_distinct_cols", ()),
        meta.get("percentile_cols") or None,
    ).withColumn("batch_id", F.lit(0))
    # materialize BEFORE the overwrite truncates the input it reads from
    merged = pin(merged, eager=True)
    (
        merged.write.mode("overwrite")
        .partitionBy("batch_id", *meta["partition_by"])
        .parquet(path)
    )
    # the whole-path overwrite removed the sidecar meta — restore it
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)
    return n_batches


def matview_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def matview_state(spark: SparkSession, path: str) -> DataFrame:
    """Current state at the view's own grain (all batches merged)."""
    meta = matview_meta(path)
    raw = spark.read.parquet(path).drop("batch_id")
    return _merge_state(raw, meta["keys"], meta["measure_cols"],
                        meta.get("approx_distinct_cols", ()),
                        meta.get("percentile_cols") or None)


def can_answer(meta: dict, q: AggQuery) -> bool:
    """Static rewrite legality — see module docstring for the rule."""
    keys = set(meta["keys"])
    if not set(q.keys) <= keys:
        return False
    if not {c for c, _, _ in q.filters} <= keys:
        return False
    stored = set(meta["measure_cols"])
    stored_hll = set(meta.get("approx_distinct_cols", ()))
    stored_pctl = set(meta.get("percentile_cols", ()) or ())
    ok = []
    for m in q.measures.values():
        fn, col, _ = _mfc(m)
        if fn == "count_rows":
            ok.append(True)
        elif fn == "approx_count_distinct":
            ok.append(col in stored_hll)
        elif fn == "approx_percentile":
            ok.append(col in stored_pctl)
        else:
            ok.append(col in stored)
    return all(ok)


def _apply_filters(df: DataFrame, q: AggQuery) -> DataFrame:
    for col, op, val in q.filters:
        df = df.filter(_OPS[op](F.col(col), val))
    return df


def _finalize_measures(q: AggQuery, round_dp: int,
                       percentile_cols: dict | None = None) -> list[Column]:
    from bloomy_etl_spark.operators.sketches import hist_est_col

    out = []
    for name, m in q.measures.items():
        fn, col, qq = _mfc(m)
        if fn == "count_rows":
            e: Column = F.col("nr")
        elif fn == "approx_count_distinct":
            e = F.round(F.hll_sketch_estimate(_sc("hll", col))).cast("long")
        elif fn == "approx_percentile":
            if not percentile_cols or col not in percentile_cols:
                raise ValueError(f"measure {name}: no histogram state "
                                 f"config for column {col!r}")
            lo, hi, _nb = percentile_cols[col]
            e = F.round(
                hist_est_col(
                    qq, F.col(_sc("ph", col)), F.col(_sc("phcum", col)),
                    F.col(_sc("phu", col)), F.col(_sc("pho", col)),
                    F.col(_sc("pmn", col)), F.col(_sc("pmx", col)),
                    F.col(_sc("pn", col)), float(lo), float(hi),
                ),
                round_dp,
            )
        else:
            n, s = F.col(_sc("n", col)), F.col(_sc("s", col))
            if fn == "count":
                e = n
            elif fn == "sum":
                e = F.round(s, round_dp)
            elif fn == "min":
                e = F.round(_sc("mn", col), round_dp)
            elif fn == "max":
                e = F.round(_sc("mx", col), round_dp)
            elif fn == "avg":
                e = F.round(F.when(n > 0, s / n), round_dp)
            else:  # stddev_pop — clamp the ~0-variance negative residue
                ssq = F.col(_sc("ssq", col))
                var = F.greatest(ssq / n - (s / n) * (s / n), F.lit(0.0))
                e = F.round(F.when(n > 0, F.sqrt(var)), round_dp)
        out.append(e.alias(name))
    return out


def answer_from_matview(
    spark: SparkSession, path: str, q: AggQuery, *, round_dp: int = 4
) -> DataFrame:
    """Rewrite ``q`` against the view: filter states (partition-pruned
    when the filter column is in ``partition_by``), re-aggregate to the
    query grain, finalize.  Scan size is the view's group count, never
    the base row count."""
    q.validate()
    meta = matview_meta(path)
    if not can_answer(meta, q):
        raise ValueError("matview cannot answer this query "
                         f"(keys={meta['keys']}, measures="
                         f"{meta['measure_cols']})")
    raw = spark.read.parquet(path).drop("batch_id")
    return answer_from_state(
        raw, q, round_dp=round_dp,
        percentile_cols=meta.get("percentile_cols") or None,
    )


def _measure_col_sets(q: AggQuery):
    plain, approx, pctl = set(), set(), set()
    for m in q.measures.values():
        fn, col, _ = _mfc(m)
        if fn == "approx_count_distinct":
            approx.add(col)
        elif fn == "approx_percentile":
            pctl.add(col)
        elif col is not None:
            plain.add(col)
    return sorted(plain), sorted(approx), sorted(pctl)


def answer_from_state(state: DataFrame, q: AggQuery, *,
                      round_dp: int = 4,
                      percentile_cols: dict | None = None) -> DataFrame:
    """Rewrite ``q`` against an in-memory/loaded state table at a finer
    grain: filter states, merge to the query grain, finalize.  This is
    the storage-free core of ``answer_from_matview`` — also the shape a
    caller uses when the fine-grain state arrives from somewhere else
    (a streaming rollup store, a shuffle-stage byproduct).
    ``percentile_cols`` (col → (lo, hi, n_bins)) is required iff the
    query has ``approx_percentile`` measures — it is the view's
    histogram contract, carried by the matview meta."""
    from bloomy_etl_spark.operators.sketches import hist_cum_col

    q.validate()
    plain, approx, pctl = _measure_col_sets(q)
    missing = [c for c in pctl if c not in (percentile_cols or {})]
    if missing:
        raise ValueError("approx_percentile measures need percentile_cols "
                         f"entries for: {missing}")
    merged = _merge_state(
        _apply_filters(state, q), q.keys, plain, approx,
        {c: percentile_cols[c] for c in pctl} if pctl else None,
    )
    for c in pctl:  # precompute the cumulative walk once per group
        merged = merged.withColumn(
            _sc("phcum", c), hist_cum_col(F.col(_sc("ph", c)))
        )
    return merged.select(
        *q.keys, *_finalize_measures(q, round_dp, percentile_cols)
    )


def answer_direct(base: DataFrame, q: AggQuery, *,
                  round_dp: int = 4) -> DataFrame:
    """The same query evaluated directly on base rows (the no-view
    plan, and the semantics oracle for the rewrite).

    ``approx_percentile`` measures are served EXACTLY here, under the
    SAME rank convention the histogram estimator uses (type-1: the
    smallest value whose cumulative count reaches ``q·n``, read off a
    ``cume_dist`` window). Convention parity is what makes the
    documented |view − direct| ≤ one-bin-width contract a theorem: the
    true type-1 quantile lives in the estimator's landing bin, and the
    clamped interpolation cannot leave it. (Spark's native
    ``percentile`` interpolates BETWEEN order statistics — against
    that convention the gap is unbounded on gappy data.)"""
    q.validate()
    plain, approx, pctl = _measure_col_sets(q)
    state = build_state(_apply_filters(base, q), q.keys, plain, approx)
    if not pctl:
        return state.select(*q.keys, *_finalize_measures(q, round_dp))
    # exact type-1 quantiles need base rows at a total order: one
    # window pass per percentile column (NULLs excluded, matching the
    # sketch's null-skip), then a conditional-min per requested q —
    # every side of the final join is |groups|-sized
    base_f = _apply_filters(base, q)
    exact: DataFrame | None = None
    for c in pctl:
        w = Window.partitionBy(*q.keys).orderBy(F.col(c).cast("double"))
        cd = (
            base_f.filter(F.col(c).isNotNull())
            .withColumn("__cd", F.cume_dist().over(w))
        )
        aggs = [
            F.round(
                F.min(F.when(F.col("__cd") >= float(qq),
                             F.col(c).cast("double"))),
                round_dp,
            ).alias(name)
            for name, m in q.measures.items()
            for fn, col, qq in [_mfc(m)]
            if fn == "approx_percentile" and col == c
        ]
        part = cd.groupBy(*q.keys).agg(*aggs)
        if exact is None:
            exact = part
        elif q.keys:
            exact = exact.join(part, list(q.keys))
        else:
            exact = exact.crossJoin(part)
    q_rest = AggQuery(q.keys,
                      {n: m for n, m in q.measures.items()
                       if _mfc(m)[0] != "approx_percentile"},
                      q.filters)
    rest = (state.select(*q.keys, *_finalize_measures(q_rest, round_dp))
            if q_rest.measures else state.select(*q.keys))
    joined = (rest.join(exact, list(q.keys)) if q.keys
              else rest.crossJoin(exact))
    return joined.select(*q.keys, *q.measures)


def answer(
    spark: SparkSession,
    q: AggQuery,
    base: DataFrame,
    matview_paths: Sequence[str] = (),
    *,
    round_dp: int = 4,
) -> tuple[DataFrame, str | None]:
    """Route ``q`` to the first view that can answer it, else the base
    table.  Returns ``(result, chosen_path_or_None)`` so callers (and
    tests) can see the routing decision."""
    q.validate()
    for path in matview_paths:
        if can_answer(matview_meta(path), q):
            return answer_from_matview(spark, path, q,
                                       round_dp=round_dp), path
    return answer_direct(base, q, round_dp=round_dp), None
