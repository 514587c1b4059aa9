"""Streaming corpus ingestion with incremental near-dup detection.

The daily-ingest loop, expressed as ONE Structured Streaming query: each
micro-batch of new documents is deduplicated against the accumulated
corpus using the STORED MinHash signatures
(:func:`bloomy_etl_spark.operators.dedup.incremental_near_dups`), then
the batch's documents and signatures are appended to the store. The
reference's batched imperative ingest (``/root/reference/core/
pipeline.py:98-124``) maps to the same shape: a replayable source,
per-batch processing, durable state between batches.

Why ``foreachBatch`` rather than a stateful operator: the dedup state
(signature store) must outlive the streaming query, be shared with batch
jobs, and be readable by the next day's run — a parquet table IS that
state. ``applyInPandasWithState`` state is checkpoint-private and
per-key; the signature store is corpus-global.

Scale: each batch pays batch-proportional work (see
``incremental_near_dups`` — the history side is probed via a broadcast
of the batch's band keys and never shuffles). The store grows as an
append-only parquet table; compact it periodically with
:func:`bloomy_etl_spark.sinks.layout.compact`.

Delivery semantics: foreachBatch is at-least-once on retry — a batch
that fails mid-append can leave partial files. The ``batch_id`` column
written with ALL THREE durable appends (pairs, corpus, signatures) makes
replays detectable and reversible (delete-by-batch_id before re-append,
or dedup on read); a transactional table format slots in at the writer
without changing the flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloomy_etl_spark.session import pin

from bloomy_etl_spark.operators.dedup import incremental_near_dups, minhash_signatures


def _read_or_empty(spark: SparkSession, path: str, like: DataFrame) -> DataFrame:
    """Read a parquet state table, or an empty frame with ``like``'s
    schema before the first batch has created it.

    ONLY the path-missing analysis error is absorbed — a corrupt footer,
    permission failure, or listing error must fail the batch loudly
    (silently deduping against an empty history would admit known
    duplicates and never record it)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return spark.createDataFrame([], like.schema)
        raise


def streaming_dedup_ingest(
    docs_stream: DataFrame,
    corpus_dir: str,
    sig_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    drop_dups: bool = False,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Attach the dedup-ingest loop to a streaming document source and
    return the started ``StreamingQuery``.

    Per micro-batch:

    1. near-dup pairs of (batch ∪ batch×corpus) are found via the stored
       signatures — within-batch pairs included, so a burst of mutual
       duplicates in one batch is caught;
    2. pairs are appended to ``pairs_dir`` (with ``batch_id``);
    3. the batch's signatures and documents are appended to ``sig_dir`` /
       ``corpus_dir``. With ``drop_dups=True`` a batch doc that matched
       the EXISTING corpus is not admitted (its signature is withheld
       too); first-arrival wins, the pair row records the evidence.
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = pin(batch.select(id_col, text_col), eager=True)
        corpus = _read_or_empty(spark, corpus_dir, batch)
        sig_like = minhash_signatures(batch.limit(0))
        sigs = _read_or_empty(spark, sig_dir, sig_like)
        pairs, new_sigs = incremental_near_dups(
            batch, corpus, sigs, threshold=threshold,
            text_col=text_col, id_col=id_col,
        )
        pairs = pin(pairs, eager=True)  # one computation, used twice
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            pairs_dir
        )
        admitted = batch
        admitted_sigs = new_sigs
        if drop_dups:
            # a batch doc loses only to the EXISTING corpus (not to a
            # same-batch sibling, where both are first arrivals)
            corpus_ids = corpus.select(F.col(id_col).alias("_cid"))
            dup_side = (
                pairs.join(corpus_ids, pairs["i"] == F.col("_cid"), "left_semi")
                .select(F.col("j").alias(id_col))
                .union(
                    pairs.join(corpus_ids, pairs["j"] == F.col("_cid"), "left_semi")
                    .select(F.col("i").alias(id_col))
                )
                .distinct()
            )
            admitted = batch.join(dup_side, id_col, "left_anti")
            admitted_sigs = new_sigs.join(dup_side, id_col, "left_anti")
        # batch_id rides every durable append so an at-least-once replay
        # is detectable and reversible (delete-by-batch_id) in ALL three
        # state tables, not just the pair log.
        admitted.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(corpus_dir)
        # reuse the checkpointed batch signatures (incremental_near_dups
        # computed them once); recomputing minhash here would double the
        # per-batch shingle+hash cost.
        admitted_sigs.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sig_dir)

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def replay_docs_dir(spark: SparkSession, sf_dir: str, out_dir: str,
                    n_files: int = 4) -> str:
    """Materialize the ``documents`` fixture as ``n_files`` id-ordered
    parquet files so a file-source stream replays it as ``n_files``
    deterministic micro-batches (the documents analogue of
    ``sources.replay_dir``)."""
    from bloomy_etl_spark.sources.tables import load_table

    (
        load_table(spark, sf_dir, "documents")
        .repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a directory written by
    :func:`replay_docs_dir`."""
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_ivfpq_ingest(
    embs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Stream new embeddings into a PERSISTED IVF-PQ index and return
    the started ``StreamingQuery``.

    Each micro-batch is assigned and PQ-encoded against the index's
    FROZEN coarse quantizer and codebooks
    (:func:`bloomy_etl_spark.operators.pq.add_to_ivfpq_index`) and
    appended into exactly the cluster partitions it lands in — vectors
    become searchable the moment their batch commits, and the final
    index equals a batch add of the same vectors (which in turn equals
    a from-scratch encode under the same frozen model; both
    equivalences are tested). The index must already exist — streaming
    never retrains; rebuild when distribution drift warrants, exactly
    the IVF ingest contract.

    Delivery: at-least-once on retry like the dedup ingest — a replayed
    batch appends its code rows twice. Ids are the caller's dedup
    contract (duplicate ids = duplicate candidates, still correct top-k
    by id tie-break); a transactional table format slots in at the
    writer for exactly-once.
    """
    from bloomy_etl_spark.operators.pq import add_to_ivfpq_index

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        add_to_ivfpq_index(batch, index_dir, id_col=id_col,
                           vec_col=vec_col)

    return (
        embs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
