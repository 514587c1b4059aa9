"""Declarative data-quality constraints compiled to ONE aggregate pass.

A training-data pipeline gates every ingest batch on invariants (keys
unique, required fields present, values in range/vocabulary) — at 100 TB
the naive one-query-per-check approach re-scans the corpus once per
constraint. Here every constraint contributes aggregate EXPRESSIONS to a
single ``agg`` over one scan (the Deequ design, rebuilt on plain
DataFrame aggregates): N constraints = 1 job, 1 pass, partial aggregation
map-side like any hash aggregate.

Each constraint is a plain dict ``{name, metric: Column, ok: Column}``
where ``metric`` is an aggregate expression (violation count / fraction)
and ``ok`` is the pass predicate over the computed metrics. The report
is a tidy long-format DataFrame ``(constraint, metric, passed)`` — the
wide single-row aggregate is unpivoted in-row with ``stack``.

Referential checks (``subset_of``) necessarily touch a second table —
they run as a broadcast-friendly anti-join count and union into the same
report (one extra job per FK, not per constraint).

Verified value-exact against a DuckDB oracle replaying every metric
(t2:q72) plus unit edge cases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Constraint = dict  # {name: str, metric: Column, ok: Column}


def not_null(col: str, max_null_fraction: float = 0.0) -> Constraint:
    """Fraction of NULLs in ``col`` must be <= ``max_null_fraction``."""
    frac = (F.count(F.lit(1)) - F.count(col)) / F.count(F.lit(1))
    return {
        "name": f"not_null({col})",
        "metric": F.round(frac, 6),
        "ok": frac <= max_null_fraction,
    }


def unique(*cols: str) -> Constraint:
    """No two rows share the same non-null ``cols`` tuple. Metric =
    surplus rows (count minus distinct count over rows where all key
    parts are non-null; NULL keys are not comparable, mirroring SQL
    UNIQUE)."""
    all_set = F.expr(" AND ".join(f"{c} IS NOT NULL" for c in cols))
    n = F.count(F.when(all_set, 1))
    surplus = (n - F.count_distinct(*[F.col(c) for c in cols])).cast("double")
    return {
        "name": f"unique({','.join(cols)})",
        "metric": surplus,
        "ok": surplus == 0,
    }


def in_range(col: str, lo: float, hi: float) -> Constraint:
    """Count of non-null values outside [lo, hi] must be 0."""
    bad = F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1)).cast("double")
    return {"name": f"in_range({col},{lo},{hi})", "metric": bad, "ok": bad == 0}


def matches(col: str, regex: str) -> Constraint:
    """Count of non-null values NOT matching ``regex`` must be 0.
    Use RE2-portable patterns (no backrefs) so the same regex runs
    everywhere."""
    bad = F.count(
        F.when(F.col(col).isNotNull() & ~F.col(col).rlike(regex), 1)
    ).cast("double")
    return {"name": f"matches({col})", "metric": bad, "ok": bad == 0}


def accepted_values(col: str, values: list) -> Constraint:
    """Count of non-null values outside the accepted set must be 0."""
    bad = F.count(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1)
    ).cast("double")
    return {
        "name": f"accepted_values({col})",
        "metric": bad,
        "ok": bad == 0,
    }


def non_negative(col: str) -> Constraint:
    bad = F.count(F.when(F.col(col) < 0, 1)).cast("double")
    return {"name": f"non_negative({col})", "metric": bad, "ok": bad == 0}


REPORT_COLS = ("constraint", "metric", "passed")


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate every constraint in ONE aggregate pass over ``df``.

    Returns ``(constraint string, metric double, passed boolean)``, one
    row per constraint, ordered by constraint name. All metrics and
    pass predicates evaluate inside a single ``agg`` — adding a
    constraint adds expressions, never a scan.
    """
    if not constraints:
        raise ValueError("no constraints given")
    names = [c["name"] for c in constraints]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate constraint names in {names}")
    aggs = []
    for i, c in enumerate(constraints):
        aggs.append(c["metric"].cast("double").alias(f"__m{i}"))
        aggs.append(c["ok"].alias(f"__p{i}"))
    wide = df.agg(*aggs)
    # in-row unpivot: stack(n, name0, m0, p0, name1, m1, p1, ...).
    # Names are embedded as SQL string literals — escape quotes so a
    # custom constraint named e.g. accepted_values(col=['a'])
    # cannot break the stack expression.
    def _q(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    parts = ", ".join(
        f"{_q(c['name'])}, __m{i}, __p{i}" for i, c in enumerate(constraints)
    )
    return (
        wide.selectExpr(
            f"stack({len(constraints)}, {parts}) AS (constraint, metric, passed)"
        )
        .orderBy("constraint")
    )


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Equivalence-class audit for k-anonymity: one row per distinct
    quasi-identifier combination with its class size ``n`` and
    ``anonymous = n >= k``.

    The release-gate question for any dataset carrying quasi-identifiers
    (location × segment × banded numeric is the classic trio): a record
    in a class smaller than k is re-identifiable by joining public
    attributes. One hash aggregate on the quasi-identifier key — the
    same shape and cost as any groupBy count, so it runs as a cheap
    pre-release gate at full corpus scale. Band continuous columns
    FIRST (``floor(x / width)``) — raw continuous values make every
    class a singleton and the audit vacuous.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("no quasi-identifier columns given")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("anonymous", F.col("n") >= k)


def k_anonymity_summary(classes: DataFrame, by: str) -> DataFrame:
    """Roll the per-class audit up to a release report per ``by``:
    class count, violating classes, records at risk, smallest class."""
    return classes.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.count(F.when(~F.col("anonymous"), 1)).alias("n_violating"),
        F.coalesce(
            F.sum(F.when(~F.col("anonymous"), F.col("n"))), F.lit(0)
        ).cast("bigint").alias("n_at_risk"),
        F.min("n").alias("min_class_size"),
    )


def subset_of(df: DataFrame, col: str, ref: DataFrame, ref_col: str,
              name: str | None = None) -> DataFrame:
    """Referential-integrity report row: every non-null ``df.col`` value
    must exist in ``ref.ref_col``. One broadcast-friendly anti-join
    count (the ref side is typically a dimension — Catalyst broadcasts
    it under the threshold; at scale pre-aggregate ``ref`` to distinct
    keys first, which this does)."""
    keys = ref.select(F.col(ref_col).alias(col)).dropDuplicates()
    orphans = (
        df.select(col).filter(F.col(col).isNotNull()).join(keys, on=col, how="left_anti")
    )
    label = name or f"subset_of({col})"
    return orphans.agg(
        F.lit(label).alias("constraint"),
        F.count(F.lit(1)).cast("double").alias("metric"),
        (F.count(F.lit(1)) == 0).alias("passed"),
    )
