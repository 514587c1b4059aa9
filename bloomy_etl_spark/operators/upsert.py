"""ANSI ``MERGE INTO``: the three-clause upsert as a pure DataFrame op.

The lakehouse write primitive (Delta/Iceberg's ``MERGE``, SQL:2003's
``MERGE INTO``): reconcile a target table with a source batch in one
pass — WHEN MATCHED THEN UPDATE, WHEN MATCHED AND <cond> THEN DELETE,
WHEN NOT MATCHED THEN INSERT.  Complements the specialized paths
already in the repo (``sinks/layout.py::upsert_partitioned`` keeps the
latest row per key, SCD1; ``scd2_apply`` keeps history chains): this
is the GENERAL form with caller-supplied clause expressions, the one a
user of a SQL engine reaches for first.

Semantics match ANSI MERGE with the standard determinism requirement:
the source must hold AT MOST ONE row per key (multiple source matches
per target row make MERGE nondeterministic; engines raise — so does
this, optionally, via ``check_unique``).  Delete wins over update when
its condition holds (clauses evaluate in delete-first order, the
Delta convention for a matched row).

Scale: ONE full-outer hash join on the merge keys — target and source
each shuffle once; every clause is a row-local projection after the
join, so the whole reconcile is join + codegen.  With a partitioned
target the join prunes to touched partitions upstream (q131's
pruned-rewrite pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_into"]


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    update_set: dict[str, Column] | None = None,
    delete_where: Column | None = None,
    insert_values: dict[str, Column] | None = None,
    check_unique: bool = False,
) -> DataFrame:
    """Reconcile ``target`` with ``source``; returns the new target.

    ``update_set`` maps target column → expression over the joined
    frame (reference target columns as ``t.<col>``, source columns as
    ``s.<col>``); unmentioned columns keep their target value.
    ``delete_where`` is evaluated on matched rows first; matches are
    dropped.  ``insert_values`` maps every target column → expression
    for source-only rows; omit it to ignore unmatched source rows.
    Target-only rows always pass through unchanged.

    ``check_unique=True`` adds a distributed uniqueness assertion on
    the source keys (one agg; raises ``ValueError`` on duplicates —
    ANSI's "cardinality violation" made explicit instead of silent).
    """
    if check_unique:
        dup = (
            source.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                "merge_into: source has multiple rows for a key "
                "(ANSI MERGE cardinality violation)"
            )
    out_cols = target.columns
    t = target.alias("t").withColumn("__t_ex", F.lit(1))
    s = source.alias("s").withColumn("__s_ex", F.lit(1))
    j = t.join(s, keys, "full_outer")
    matched = F.col("__t_ex").isNotNull() & F.col("__s_ex").isNotNull()
    t_only = F.col("__s_ex").isNull()
    if delete_where is not None:
        j = j.filter(~(matched & delete_where))
    if insert_values is None:
        j = j.filter(F.col("__t_ex").isNotNull())
    upd = update_set or {}
    proj = []
    for c in out_cols:
        if c in keys:
            # join key: coalesce of both sides (source-only rows carry
            # the key in the coalesced output column already)
            proj.append(F.col(c))
            continue
        keep = F.col(f"t.{c}")
        val = F.when(matched, upd.get(c, keep)).otherwise(keep)
        if insert_values is not None:
            if c not in insert_values:
                raise ValueError(
                    f"merge_into: insert_values missing column {c!r}"
                )
            val = F.when(t_only | matched, val).otherwise(insert_values[c])
        proj.append(val.alias(c))
    return j.select(*proj)
