"""SparkSession factory.

Defaults are chosen for correctness-critical semantics first (UTC session
timezone, ANSI off to match the reference's permissive arithmetic) and
scale second (AQE on, partition coalescing, Arrow transfers for the
pandas-UDF path).

On a real cluster the same factory applies — only ``master`` and memory
sizing change. Shuffle partitions default to a small local-friendly value
but AQE coalescing makes the setting soft: at 100 TB you would raise
``spark.sql.shuffle.partitions`` (or set
``spark.sql.adaptive.coalescePartitions.initialPartitionNum``) and let AQE
shrink per-stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # --- correctness-critical ---
    "spark.sql.session.timeZone": "UTC",
    # The reference's arithmetic is NumPy-permissive (no overflow errors,
    # silent NULL on bad casts); ANSI mode would change division/cast
    # semantics mid-query.
    "spark.sql.ansi.enabled": "false",
    # --- scale/perf ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Let AQE coalesce post-shuffle partitions to the advisory size rather
    # than preserving task-count parallelism: on this deployment (local,
    # single-digit-MB shuffles) 32 near-empty reduce tasks per stage cost
    # more scheduling than they buy in parallelism. The advisory is a
    # DEPLOYMENT sizing knob: 1m fits the bench's shuffle volumes while
    # leaving compute-heavy stages (shingle posting lists, pair
    # generation — several MB) multiple partitions wide; a cluster run at
    # real scale should raise it to 64-256m (partitions there exceed any
    # advisory, so coalescing simply stops firing — plan shapes are
    # unchanged).
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.parquet.filterPushdown": "true",
    # The events fixture stores TIMESTAMP(NANOS); Spark rejects it unless
    # read as raw int64 ns — sources/tables.py converts ns → µs timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # local[N] has no network shuffle; keep partition count near core count.
    "spark.sql.shuffle.partitions": "32",
    # Small fixture files land in one input split by default (128 MB
    # target), serializing compute-heavy scans (shingling, hashing) onto a
    # single core. Force at least one split per core; at cluster scale
    # files exceed the split target anyway, so this floor is inert there.
    "spark.sql.files.minPartitionNum": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "48g",
}


def get_spark(app_name: str = "bloomy_etl_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). ``extra_conf`` overrides any default.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
