"""Schema conformance for heterogeneous ingest: make a batch match a
target table schema under explicit, named policies.

A 100 TB corpus is never written by one producer: shards arrive with
extra debug columns, early shards predate a column, a producer switched
``int`` → ``long``. The lakehouse answer is declarative conformance at
the ingest boundary — every batch is reshaped to the TARGET schema or
rejected loudly, so downstream operators see one stable shape
(the same contract ``sources/tables.py::load_table`` enforces for the
fixture tables, generalized to arbitrary targets).

Policies (each failure mode gets its own decision, defaults are the
safe ones):

- ``on_extra``:   'drop' (default) | 'keep' | 'error' — columns present
                  in the batch but not the target.
- ``on_missing``: 'null' (default) | 'error' — target columns absent
                  from the batch; 'null' adds them as typed NULLs
                  (nullable evolution, the parquet/Delta convention).
- ``on_type``:    'widen' (default) | 'cast' | 'error' — dtype drift.
                  'widen' permits only LOSSLESS promotions (the
                  parquet/Avro/Delta evolution lattice below); 'cast'
                  permits any Spark cast (lossy allowed — opt-in);
                  'error' demands exact dtype equality.

Everything is driver-side schema arithmetic + one ``select`` — zero
jobs, zero shuffles; the cost at any scale is the cast expressions
fused into the scan projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Lossless widening lattice (parquet/Avro schema-evolution rules):
# each source type may promote to any type in its set.
_WIDEN: dict[str, set[str]] = {  # keys/values are simpleString() names
    "tinyint": {"smallint", "int", "bigint", "float", "double", "decimal"},
    "smallint": {"int", "bigint", "float", "double", "decimal"},
    "int": {"bigint", "double", "decimal"},
    "bigint": {"decimal"},
    "float": {"double"},
    "date": {"timestamp", "timestamp_ntz"},
}


class SchemaConformError(ValueError):
    """Batch cannot be conformed to the target under the given policy."""


def _type_name(dt: T.DataType) -> str:
    return "decimal" if isinstance(dt, T.DecimalType) else dt.simpleString()


# Decimal digits needed to hold every value of an integral type (Spark's
# Cast.canUpCast rule): a promotion to decimal is lossless only when the
# target keeps at least this many INTEGER digits (precision - scale).
_INT_DIGITS: dict[str, int] = {
    "tinyint": 3,    # ±127
    "smallint": 5,   # ±32767
    "int": 10,       # ±2147483647
    "bigint": 20,    # ±9223372036854775807 needs 19; 20 per canUpCast
}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    if not (_type_name(dst) in _WIDEN.get(_type_name(src), set())):
        return False
    # int → decimal is lossless only if the decimal's integer digits
    # cover the full source range — bigint → decimal(5,0) overflows
    # (NULLs in permissive mode), which 'widen' must never admit.
    if isinstance(dst, T.DecimalType):
        need = _INT_DIGITS.get(_type_name(src))
        if need is not None and dst.precision - dst.scale < need:
            return False
    return True


def conform_schema(df: DataFrame, target: T.StructType,
                   on_extra: str = "drop", on_missing: str = "null",
                   on_type: str = "widen") -> DataFrame:
    """Reshape ``df`` to ``target``'s columns, order, and dtypes.

    Returns a DataFrame whose schema equals ``target`` (plus the
    batch's extra columns appended when ``on_extra='keep'``). Raises
    :class:`SchemaConformError` naming every offending column when a
    policy says 'error' — one exception lists ALL problems, not just
    the first (a failed ingest audit should not be a whack-a-mole).
    """
    if on_extra not in ("drop", "keep", "error"):
        raise ValueError(f"on_extra must be drop|keep|error, got {on_extra!r}")
    if on_missing not in ("null", "error"):
        raise ValueError(f"on_missing must be null|error, got {on_missing!r}")
    if on_type not in ("widen", "cast", "error"):
        raise ValueError(f"on_type must be widen|cast|error, got {on_type!r}")

    have = {f.name: f for f in df.schema.fields}
    want = list(target.fields)
    want_names = {f.name for f in want}
    problems: list[str] = []

    extra = [c for c in df.columns if c not in want_names]
    if extra and on_extra == "error":
        problems.append(f"extra columns {extra}")

    cols = []
    for f in want:
        if f.name not in have:
            if on_missing == "error":
                problems.append(f"missing column {f.name!r}")
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = have[f.name].dataType
        if src == f.dataType:
            cols.append(F.col(f.name))
        elif on_type == "error":
            problems.append(
                f"dtype mismatch {f.name!r}: {src.simpleString()} != "
                f"{f.dataType.simpleString()}"
            )
        elif on_type == "widen" and not _can_widen(src, f.dataType):
            problems.append(
                f"lossy dtype change {f.name!r}: {src.simpleString()} -> "
                f"{f.dataType.simpleString()} (use on_type='cast' to allow)"
            )
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))

    if problems:
        raise SchemaConformError(
            "batch does not conform to target schema: " + "; ".join(problems)
        )
    if on_extra == "keep":
        cols += [F.col(c) for c in extra]
    return df.select(*cols)


def conform_union(batches: list[DataFrame], target: T.StructType,
                  **policies) -> DataFrame:
    """Conform every batch then union — the multi-producer ingest shape
    (each shard generation conforms independently, so one old batch
    cannot veto the others' stricter dtypes)."""
    if not batches:
        raise ValueError("no batches given")
    out = conform_schema(batches[0], target, **policies)
    for b in batches[1:]:
        out = out.unionByName(conform_schema(b, target, **policies))
    return out
