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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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
]

_STATE_PREFIXES = ("n", "s", "mn", "mx", "ssq")
_FNS = frozenset(
    {"count_rows", "count", "sum", "min", "max", "avg", "stddev_pop",
     "approx_count_distinct"}
)
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
    ``approx_distinct_cols`` — served from the mergeable HLL sketch),
    under conjunctive ``filters`` ((col, op, value), op ∈ = != < <= >
    >= in).  The spec form is what makes rewrite legality checkable."""

    keys: tuple[str, ...]
    measures: dict[str, tuple[str, str | None]]
    filters: tuple[tuple[str, str, object], ...] = field(default_factory=tuple)

    def validate(self) -> None:
        for out, (fn, col) in self.measures.items():
            if fn not in _FNS:
                raise ValueError(f"measure {out}: unknown fn {fn!r}")
            if (col is None) != (fn == "count_rows"):
                raise ValueError(f"measure {out}: col must be set iff fn"
                                 " is not count_rows")
        for col, op, _ in self.filters:
            if op not in _OPS:
                raise ValueError(f"filter on {col}: unknown op {op!r}")


def _sc(prefix: str, col: str) -> str:
    return f"{prefix}__{col}"


def build_state(df: DataFrame, keys: Sequence[str],
                 measure_cols: Sequence[str],
                 approx_distinct_cols: Sequence[str] = ()) -> DataFrame:
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
    return df.groupBy(*keys).agg(*aggs)


def _merge_state(state: DataFrame, keys: Sequence[str],
                 measure_cols: Sequence[str],
                 approx_distinct_cols: Sequence[str] = ()) -> DataFrame:
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
    return state.groupBy(*keys).agg(*aggs)


def _meta_path(path: str) -> str:
    return os.path.join(path, "_mv_meta.json")


def create_matview(
    df: DataFrame,
    keys: Sequence[str],
    measure_cols: Sequence[str],
    path: str,
    *,
    approx_distinct_cols: Sequence[str] = (),
    partition_by: Sequence[str] = (),
) -> None:
    """Materialize partial states of ``df`` at grain ``keys`` for every
    column in ``measure_cols``.  ``partition_by`` (⊆ keys) lays the view
    out for partition pruning on those keys.  The initial load is batch
    0 of the refresh log."""
    if not set(partition_by) <= set(keys):
        raise ValueError("partition_by must be a subset of keys")
    state = build_state(
        df, keys, measure_cols, approx_distinct_cols
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
                        meta.get("approx_distinct_cols", ()))
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


def matview_meta(path: str) -> dict:
    with open(_meta_path(path)) as f:
        return json.load(f)


def matview_state(spark: SparkSession, path: str) -> DataFrame:
    """Current state at the view's own grain (all batches merged)."""
    meta = matview_meta(path)
    raw = spark.read.parquet(path).drop("batch_id")
    return _merge_state(raw, meta["keys"], meta["measure_cols"],
                        meta.get("approx_distinct_cols", ()))


def can_answer(meta: dict, q: AggQuery) -> bool:
    """Static rewrite legality — see module docstring for the rule."""
    keys = set(meta["keys"])
    if not set(q.keys) <= keys:
        return False
    if not {c for c, _, _ in q.filters} <= keys:
        return False
    stored = set(meta["measure_cols"])
    stored_hll = set(meta.get("approx_distinct_cols", ()))
    return all(
        fn == "count_rows"
        or (col in stored_hll if fn == "approx_count_distinct"
            else col in stored)
        for fn, col in q.measures.values()
    )


def _apply_filters(df: DataFrame, q: AggQuery) -> DataFrame:
    for col, op, val in q.filters:
        df = df.filter(_OPS[op](F.col(col), val))
    return df


def _finalize_measures(q: AggQuery, round_dp: int) -> list[Column]:
    out = []
    for name, (fn, col) in q.measures.items():
        if fn == "count_rows":
            e: Column = F.col("nr")
        elif fn == "approx_count_distinct":
            e = F.round(F.hll_sketch_estimate(_sc("hll", col))).cast("long")
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
    return answer_from_state(raw, q, round_dp=round_dp)


def answer_from_state(state: DataFrame, q: AggQuery, *,
                      round_dp: int = 4) -> DataFrame:
    """Rewrite ``q`` against an in-memory/loaded state table at a finer
    grain: filter states, merge to the query grain, finalize.  This is
    the storage-free core of ``answer_from_matview`` — also the shape a
    caller uses when the fine-grain state arrives from somewhere else
    (a streaming rollup store, a shuffle-stage byproduct)."""
    q.validate()
    plain = sorted({c for fn, c in q.measures.values()
                    if c is not None and fn != "approx_count_distinct"})
    approx = sorted({c for fn, c in q.measures.values()
                     if fn == "approx_count_distinct"})
    merged = _merge_state(_apply_filters(state, q), q.keys, plain, approx)
    return merged.select(*q.keys, *_finalize_measures(q, round_dp))


def answer_direct(base: DataFrame, q: AggQuery, *,
                  round_dp: int = 4) -> DataFrame:
    """The same query evaluated directly on base rows (the no-view
    plan, and the semantics oracle for the rewrite)."""
    q.validate()
    state = build_state(
        _apply_filters(base, q),
        q.keys,
        sorted({c for fn, c in q.measures.values()
                if c is not None and fn != "approx_count_distinct"}),
        sorted({c for fn, c in q.measures.values()
                if fn == "approx_count_distinct"}),
    )
    return state.select(*q.keys, *_finalize_measures(q, round_dp))


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
