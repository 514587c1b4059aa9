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

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# id(session) -> {(path, fan_out): (mtime, scan DataFrame)}; see
# load_table. NOT a WeakKeyDictionary: the cached DataFrames hold strong
# references back to their session, so a weak key could never die while
# its entry exists — the weakness would be decorative. Instead the outer
# map is a small LRU over SESSIONS: evicting an old session's dict drops
# its DataFrames, releasing the session itself. id-keying is sound
# precisely BECAUSE a live entry pins its session (the id cannot be
# reused until the entry — and with it the pin — is gone).
_PLAN_MEMO: OrderedDict[int, dict] = OrderedDict()
_MAX_MEMO_SESSIONS = 4

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to plain TIMESTAMP (µs, session-tz instant).

    Fixture generations have shipped two physical types:

    * parquet TIMESTAMP(NANOS) — Spark (with ``nanosAsLong``) scans it as
      int64 epoch-ns. Convert with integer division: epoch-ns (~1.7e18)
      exceeds double's 53-bit mantissa, so a float path would corrupt
      low-order microseconds.
    * parquet ``timestamp[us]`` without timezone — Spark scans it as
      TIMESTAMP_NTZ, which ``unix_micros``/``window`` et al. reject. Under
      the UTC session timezone the NTZ→TIMESTAMP cast is value-preserving
      (same wall-clock field values, now pinned to UTC instants).

    Downstream operators only ever see TimestampType.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fan_out: bool = False) -> DataFrame:
    """Read one fixture table.

    ``fan_out=True`` repartitions a narrow scan across all cores. The
    fixtures are single-row-group parquet files, so their scan is ONE
    unsplittable partition; an operator whose per-row compute dominates
    scan cost (shingling/MinHash, vector math, Arrow-batched decode)
    requests fan-out so that work spreads, paying one small shuffle.
    Cheap scans (plain aggregates, digest grouping) must NOT fan out —
    measured at sf0.1 the extra shuffle costs more than it recovers. At
    cluster scale inputs exceed the split target and the repartition is a
    no-op either way, so the flag only affects small-file corners."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Driver-side plan memo: a DataFrame is an immutable logical plan,
    # so the (session, dir, table, fan_out) scan can be built once and
    # reused across queries/runs. Re-building it pays file listing +
    # parquet footer schema inference + (events) two conf round-trips
    # per call — pure fixed overhead on a 100-query bench loop, and a
    # cheap win on a real cluster too (object-store LIST calls are the
    # slow part there). The memo holds PLANS, not data: no caching of
    # rows, no CacheManager entries, nothing pinned on executors.
    # The path's mtime is checked on every call (one stat), and a
    # mismatch REPLACES that path's entry — a rewritten table evicts
    # only its own stale plan, never the whole memo. The per-session
    # cap only guards against unbounded DISTINCT paths.
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None  # let spark.read raise its own, clearer error
    sid = id(spark)
    session_memo = _PLAN_MEMO.setdefault(sid, {})
    _PLAN_MEMO.move_to_end(sid)
    while len(_PLAN_MEMO) > _MAX_MEMO_SESSIONS:
        _PLAN_MEMO.popitem(last=False)
    key = (path, fan_out)
    hit = session_memo.get(key)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    if len(session_memo) >= 512:
        session_memo.clear()
    if name == "events":
        # Older events fixtures store TIMESTAMP(NANOS), which Spark rejects
        # outright; set the session conf here (not only in our session
        # factory) so the loader also works under a caller-provided session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The engine's documented timestamp semantic is UTC (session.py);
        # pin it for caller-provided sessions too — the NTZ→TIMESTAMP
        # normalization below and all epoch arithmetic (unix_micros vs the
        # DuckDB oracle's naive-as-UTC epoch()) depend on it.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    if fan_out:
        cores = spark.sparkContext.defaultParallelism
        # file-count heuristic, NOT df.rdd.getNumPartitions(): the rdd
        # probe forces a plan→RDD translation on the driver per query
        # (measured overhead on the bench hot path). inputFiles() reuses
        # the already-resolved file listing. Single-file fixtures always
        # need the respread; a many-file cluster table never does.
        if len(df.inputFiles()) < cores:
            df = df.repartition(cores)
    session_memo[key] = (mtime, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
