"""Fixture table readers.

The ten driver-generated parquet tables (``TESTDATA.md``) are the engine's
relational inputs. Schemas are carried by the parquet footers; we read them
as-is and rely on Catalyst's column pruning + predicate pushdown (verified
in tests/test_plans.py) rather than hand-projecting.

At 100 TB these would be partitioned tables (e.g. orders by month,
events by date) behind a catalog; the loader interface stays the same —
``load_table(spark, sf_dir, name)`` maps to ``spark.read.table(name)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should broadcast in joins at any scale.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

# Tables whose per-row compute (text shingling/hashing, vector math)
# dominates scan cost — candidates for scan fan-out (see load_table).
COMPUTE_HEAVY_TABLES = frozenset({"documents", "embeddings"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # The events fixture stores TIMESTAMP(NANOS), which Spark rejects
        # outright; set the session conf here (not only in our session
        # factory) so the loader also works under a caller-provided session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as int64 ns (nanosAsLong). Integer
        # division — epoch-ns (~1.7e18) exceeds double's 53-bit mantissa,
        # so a float path would corrupt low-order microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if name in COMPUTE_HEAVY_TABLES:
        # Single-row-group fixture files arrive as one unsplittable scan
        # partition, serializing per-row-heavy work (shingling, hashing,
        # vector math) onto one core. Fan out when the scan has fewer
        # partitions than cores; at cluster scale scans already exceed
        # core count and this is a no-op.
        cores = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < cores:
            df = df.repartition(cores)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
