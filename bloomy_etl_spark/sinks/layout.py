"""Storage layout for cluster-scale tables: date partitioning and hash
bucketing.

At 100 TB the single-file fixture model becomes a partitioned lakehouse
table, and the two layout decisions that dominate query cost are made at
WRITE time:

* **Date partitioning** (`partitionBy(date)`): time-range predicates
  become partition PRUNING — the scan never lists, opens, or reads
  out-of-range files. Every time-sliced query in the corpus (absolute
  timestamp filters F14, event-window queries, day merges) turns from
  full-scan + filter into touching only matching directories.
* **Hash bucketing** (`bucketBy(n, key)`): both sides of a recurring
  equi-join written with the same bucket count and key are CO-LOCATED —
  the join compiles with no Exchange on either side. This is how the
  fact-fact joins (events ⋈ orders on user/custkey) drop their shuffle
  at scale; tests assert the exchange-free plan, not just the result.

The reference keeps its cache as one NetCDF per AOI-year
(`/root/reference/core/pipeline.py:163-177` writes a single file); this
module is the distributed replacement for that layout decision.

Write-side notes: ``maxRecordsPerFile`` bounds file size under skewed
partitions; bucket counts should be sized so one bucket of the LARGER
table fits an executor core's working set (tests use small counts). A
bucketed table must be registered in a catalog (Spark derives the
no-shuffle plan from catalog metadata, not file names) — the functions
here register external tables at an explicit path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                           max_records_per_file: int = 5_000_000) -> None:
    """Write ``df`` date-partitioned on ``to_date(ts_col)``.

    The partition column is materialized as ``p_date`` (kept separate
    from the full-precision timestamp, which stays in the data files).
    """
    (
        df.withColumn("p_date", F.to_date(F.col(ts_col)))
        .repartition("p_date")  # one task-group per partition dir, no tiny files
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("p_date")
        .parquet(path)
    )


def read_date_pruned(spark: SparkSession, path: str,
                     start: str | None = None,
                     end: str | None = None) -> DataFrame:
    """Read a date-partitioned table with partition-pruning filters.

    The ``p_date`` comparisons bind to the partition column, so Catalyst
    turns them into PartitionFilters (directory pruning) rather than data
    filters — asserted in tests/test_layout.py.
    """
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(F.col("p_date") >= F.lit(start).cast("date"))
    if end is not None:
        df = df.filter(F.col("p_date") <= F.lit(end).cast("date"))
    return df


def write_bucketed_table(df: DataFrame, name: str, path: str,
                         bucket_col: str, n_buckets: int = 32,
                         sort: bool = True) -> None:
    """Register ``df`` as an external bucketed table at ``path``.

    ``sortBy`` the bucket key too: a sort-merge join between two tables
    bucketed AND sorted on the key needs neither exchange nor sort —
    the scan satisfies both requirements.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(name)


def cocluster_join(spark: SparkSession, left_name: str, right_name: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.

    With matching bucket counts the plan contains NO Exchange: each task
    reads bucket i of both tables and joins locally. This is the layout
    the recurring fact-fact joins should be written into at scale.
    """
    return spark.table(left_name).join(spark.table(right_name), key, how)
