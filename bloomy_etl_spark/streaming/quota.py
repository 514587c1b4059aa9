"""Streaming per-domain ingest quotas — the live-ingest counterpart of
``operators/corpus.py::domain_cap``.

Batch capping ranks a finished corpus; an INGEST pipeline has to decide
per arriving document, with only the running count per domain as state.
The standard contract is first-arrival-wins: each domain admits its
first ``cap`` documents (in stream order: micro-batch order, then a
deterministic in-batch order) and rejects the rest — crawl throttling,
per-tenant quotas, and freshness-window caps all reduce to this.

Implementation: ``applyInPandasWithState`` keyed by the domain. The
state is ONE int per domain (admitted so far) — constant memory per key
regardless of stream length, exactly the state-shape
``applyInPandasWithState`` exists for (contrast with
``streaming/ingest.py``'s corpus-global parquet state, which uses
``foreachBatch`` instead; the two modules document the decision rule).

Scale: one shuffle per micro-batch keyed by domain; a hot domain's
batch slice lands on one task but the per-row work is a counter
increment, so throughput is bounded by shuffle, not state. Admission is
deterministic for a deterministic source: batch order, then
``(id)`` ascending within the batch slice.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMIT_SCHEMA = "domain string, doc_id long, admitted boolean, admit_rank int"
_STATE_SCHEMA = "n long"


def _quota_fn(cap: int):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (domain,) = key
        n = state.get[0] if state.exists else 0
        out = []
        # A large group slice arrives as MULTIPLE Arrow chunks — the
        # deterministic "ascending id" admission order must hold across
        # the whole micro-batch slice, so concatenate every chunk before
        # the one sort (chunk-local sorts would make admission depend on
        # Arrow batch boundaries). The slice is bounded by the
        # micro-batch size, so the concat is safe.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        all_ids = (
            pd.concat(chunks, ignore_index=True)["doc_id"]
            if chunks
            else pd.Series([], dtype="int64")
        )
        for doc_id in sorted(all_ids.tolist()):
            n += 1
            out.append(
                {
                    "domain": domain,
                    "doc_id": int(doc_id),
                    "admitted": n <= cap,
                    "admit_rank": n,
                }
            )
        state.update((n,))
        yield pd.DataFrame(
            out, columns=["domain", "doc_id", "admitted", "admit_rank"]
        )

    return fn


def streaming_domain_quota(docs_stream: DataFrame, cap: int,
                           domain_col: str = "source",
                           id_col: str = "doc_id") -> DataFrame:
    """Admission decisions for a document stream under a per-domain cap.
    Returns a streaming DataFrame of (domain, doc_id, admitted,
    admit_rank); downstream typically filters ``admitted`` and joins the
    payload back (or the caller applies the decision in the same batch).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    cols = docs_stream.select(
        docs_stream[domain_col].alias("domain"),
        docs_stream[id_col].alias("doc_id"),
    )
    return cols.groupBy("domain").applyInPandasWithState(
        _quota_fn(cap),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cms_ingest(items_stream: DataFrame, sketch_dir: str,
                         checkpoint_dir: str, item_col: str,
                         depth: int = 4, width: int = 256):
    """Maintain a durable count-min sketch over a stream — the live
    frequency oracle for arriving tokens/domains/URLs. Each micro-batch
    builds its own (bounded, d×w) sketch and appends it with a
    ``batch_id``; readers merge on read (cell-wise SUM — the CMS merge
    property makes appends commutative, so at-least-once batch replays
    are detectable by batch_id and reversible by delete-by-batch_id,
    same durability contract as ``streaming/ingest.py``).

    ``foreachBatch`` rather than a stateful operator for the same reason
    as the signature store: the sketch must outlive the query, be
    readable by batch jobs, and merge with offline-built sketches — a
    parquet table IS that state. Per-batch cost: one bounded
    aggregation; the store grows by ≤ d·w rows per batch and compacts
    with ``sinks.layout.compact``."""
    from pyspark.sql import functions as F

    from bloomy_etl_spark.operators.sketches import cms_build

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        sk = cms_build(batch, item_col, depth=depth, width=width)
        sk.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            sketch_dir
        )

    return (
        items_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_rollup_ingest(stream: DataFrame, store_dir: str,
                            checkpoint_dir: str, keys: list[str],
                            measure_col: str):
    """Maintain a durable incremental-aggregate rollup over a stream —
    the live counterpart of ``operators/incremental.py``: each
    micro-batch folds to per-group partial states (count/sum/min/max/
    sumsq) and appends them with its ``batch_id``; readers merge +
    finalize on read, so current per-group count/sum/min/max/avg/stddev
    are always one bounded aggregation away, never a recompute of the
    stream's history.

    ``foreachBatch`` for the same reason as the CMS/signature stores:
    the rollup must outlive the query, merge with batch-built states,
    and stay queryable mid-stream; the state monoid makes at-least-once
    replays detectable (batch_id) and reversible (delete-by-batch_id).
    Per-batch cost: one partial aggregation over the batch — state rows
    per batch ≤ |groups touched|."""
    from bloomy_etl_spark.operators.incremental import (
        incremental_store,
        partial_states,
    )

    store = incremental_store(store_dir)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        store.append(partial_states(batch, keys, measure_col), batch_id)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_rollup_store(spark, store_dir: str):
    """Current finalized rollup from the durable state table (merge is
    one partial-agg pass; compact with ``sinks.layout.compact``)."""
    from bloomy_etl_spark.operators.incremental import (
        finalize,
        incremental_store,
    )

    return finalize(incremental_store(store_dir).current(spark))


def read_cms_store(spark, sketch_dir: str):
    """Current merged sketch: cell-wise sum over every appended batch
    sketch (partial aggregation collapses batches map-side)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(sketch_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
