"""ANALYZE-style table statistics in one distributed pass.

The numbers a query planner (or a human sizing a pipeline) needs before
touching a new table: row count, per-column null fraction, approximate
distinct count, min/max for orderable types, average length for
strings. Feeds decisions this engine makes explicitly elsewhere —
broadcast-side choice (`BROADCAST_TABLES`), bucket counts
(`sinks/layout.py`), LSH banding parameters (dedup docstrings) — and is
the same shape `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` stores
into a real catalog.

Scale: ONE aggregation job regardless of column count — every statistic
is an expression in a single ``agg`` (HLL sketches for ndv, so memory is
per-column-constant), with map-side partial aggregation doing the heavy
lifting. Nothing is collected but the one stats row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORDERABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
    T.DateType, T.TimestampType, T.TimestampNTZType, T.StringType,
)


def collect_table_stats(df: DataFrame, rsd: float = 0.05) -> dict:
    """Profile ``df`` in one pass; returns
    ``{"n_rows": N, "columns": {name: {...per-column stats...}}}``.

    Per column: ``nulls``, ``null_frac``, ``approx_ndv`` (HLL++, relative
    error ``rsd``), plus ``min``/``max`` for orderable types and
    ``avg_len`` for strings. Complex types (arrays, structs, maps) get
    counts only — min/max over them is not meaningful for planning.
    """
    exprs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c, q = f.name, F.col(f.name)
        exprs.append(F.sum(q.isNull().cast("long")).alias(f"__nulls__{c}"))
        exprs.append(F.approx_count_distinct(q, rsd).alias(f"__ndv__{c}"))
        if isinstance(f.dataType, _ORDERABLE):
            exprs.append(F.min(q).alias(f"__min__{c}"))
            exprs.append(F.max(q).alias(f"__max__{c}"))
        if isinstance(f.dataType, T.StringType):
            exprs.append(F.avg(F.length(q)).alias(f"__len__{c}"))
    row = df.agg(*exprs).first().asDict()
    n = row["__n"]
    cols: dict[str, dict] = {}
    for f in df.schema.fields:
        c = f.name
        stats = {
            "type": f.dataType.simpleString(),
            "nulls": row[f"__nulls__{c}"],
            "null_frac": round(row[f"__nulls__{c}"] / n, 6) if n else None,
            "approx_ndv": row[f"__ndv__{c}"],
        }
        if f"__min__{c}" in row:
            stats["min"] = row[f"__min__{c}"]
            stats["max"] = row[f"__max__{c}"]
        if f"__len__{c}" in row and row[f"__len__{c}"] is not None:
            stats["avg_len"] = round(row[f"__len__{c}"], 2)
        cols[c] = stats
    return {"n_rows": n, "columns": cols}
