"""Z-order (Morton) data layout + zone-map skipping.

The lakehouse data-layout optimizer: rewrite a table physically sorted
along the interleaved bits of two filter dimensions so that FILE-level
min/max statistics (zone maps — what every parquet reader keeps per
row group, and Delta/Iceberg keep per file) prune multi-dimensional
predicates.  A linear sort clusters one dimension perfectly and the
other not at all; the Morton curve bounds BOTH dimensions' spread
within any contiguous rank range, which is why ``OPTIMIZE ... ZORDER
BY`` is the flagship layout command at 100 TB — the same scan with the
same zone maps skips ~√selectivity of the files instead of none.

The reference engine has no layout optimizer (it re-reads everything
per query, ``/root/reference/core/processor.py``); this module is the
capability a Spark-backed lake adds on top of the same query surface.

Scale design
------------
* The z-value is pure in-row bit arithmetic (whole-stage codegen —
  no UDF, no shuffle).
* The physical order is a GLOBAL rank over ``(z, tiebreak)`` — computed
  with the two-phase distributed scan (per-bucket counts → B-row
  offset window → per-bucket local rank), the ``shard_by_token_budget``
  pattern (``operators/corpus.py``): no single-task global window at
  any point.  Buckets are contiguous z-ranges, so bucket-major order ≡
  global z-order and ranks are exact.
* Zone maps are one bounded hash-agg at file grain: O(files) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["zvalue", "zorder_files", "zone_maps"]


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave two non-negative ``bits``-wide integers.

    Bit ``k`` of ``y`` lands at position ``2k``, bit ``k`` of ``x`` at
    ``2k+1`` — the standard Z-curve.  Expanded as a sum of ``2·bits``
    shift/mask terms so the whole expression stays inside codegen and
    is trivially replayable in ANSI SQL (the oracle spells the same
    sum).  Inputs must already be reduced to ``[0, 2^bits)`` (callers
    bucket with ``pmod``).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    terms = []
    for k in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x.cast("long"), k) % 2, 2 * k + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(y.cast("long"), k) % 2, 2 * k)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_files(df: DataFrame, x_col: str, y_col: str,
                 order_col: str, *, bits: int = 8,
                 rows_per_file: int = 500,
                 buckets: int = 256) -> DataFrame:
    """Assign every row to its Z-ordered output file.

    Rows are globally ranked by ``(z, order_col)`` (exact, two-phase —
    see module docstring) and cut into consecutive files of
    ``rows_per_file``.  Returns the input columns plus ``(z, file_id)``.
    ``x_col``/``y_col`` must already be bucketed to ``[0, 2^bits)``.
    """
    if rows_per_file < 1:
        raise ValueError("rows_per_file must be >= 1")
    z = zvalue(F.col(x_col), F.col(y_col), bits)
    zmax = 1 << (2 * bits)
    width = (zmax + buckets - 1) // buckets
    base = df.withColumn("z", z).withColumn(
        "__b", F.floor(F.col("z") / F.lit(width)).cast("int")
    )
    btot = base.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = btot.select(
        "__b", (F.sum("__n").over(w_off) - F.col("__n")).alias("__off")
    )
    w_loc = Window.partitionBy("__b").orderBy(
        F.col("z").asc(), F.col(order_col).asc()
    )
    return (
        base.join(F.broadcast(offs), "__b")
        .withColumn("__rk", F.col("__off") + F.row_number().over(w_loc) - 1)
        .withColumn(
            "file_id",
            F.expr(f"__rk DIV CAST({rows_per_file} AS BIGINT)"),
        )
        .drop("__b", "__off", "__rk")
    )


def zone_maps(assigned: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """File-grain min/max statistics over the layout dimensions.

    One bounded hash-agg: ``(file_id, n_rows, x_min, x_max, y_min,
    y_max, z_min, z_max)`` — the skipping index a reader consults
    before opening a file.
    """
    return assigned.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(x_col).cast("long").alias("x_min"),
        F.max(x_col).cast("long").alias("x_max"),
        F.min(y_col).cast("long").alias("y_min"),
        F.max(y_col).cast("long").alias("y_max"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
    )
