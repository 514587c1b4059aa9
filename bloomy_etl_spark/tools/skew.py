"""Join-key skew diagnostics: measure before you salt.

``operators/joins.py::salted_join`` fixes a hot key — this tool finds
it and sizes the fix.  One aggregation pass (map-side combine means the
shuffle carries per-partition partial counts, not rows), TakeOrdered
for the hitter list, everything else is arithmetic on O(top) rows.

The recommendation mirrors what an engineer reads off the Spark UI:
a key whose row share exceeds several average task shares will
straggle its task; ``n_salts`` is sized so the hottest key spreads to
roughly average-task granularity, capped to the parallelism (more
salts than tasks buys nothing and multiplies the small side's
replication in ``salted_join``)."""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_report"]


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    top: int = 10,
    straggler_factor: float = 4.0,
    broadcast_rows: int = 1_000_000,
) -> dict:
    """Skew profile of ``key_cols`` as join keys.

    Returns ``{n_rows, n_keys, avg_per_key, top: [{key, n, share}…],
    max_share, skew_factor, recommendation: {strategy, n_salts}}``.

    ``skew_factor`` = hottest key's rows ÷ average rows per shuffle
    task.  Strategy: ``"broadcast"`` when the whole table fits the
    broadcast bound (skew is then irrelevant), ``"salt"`` when the
    hottest key would straggle (factor > ``straggler_factor``) with
    ``n_salts = ceil(factor)`` capped at the parallelism, else
    ``"none"``.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.sum("n").alias("rows"),
        F.count(F.lit(1)).alias("keys"),
        F.max("n").alias("mx"),
    ).first()
    n_rows, n_keys, mx = stats["rows"] or 0, stats["keys"], stats["mx"] or 0
    hitters = [
        {
            "key": tuple(r[k] for k in keys),
            "n": r["n"],
            "share": (r["n"] / n_rows) if n_rows else 0.0,
        }
        for r in counts.orderBy(F.col("n").desc(), *keys).take(top)
    ]
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    avg_task = n_rows / parallelism if n_rows else 0.0
    skew_factor = (mx / avg_task) if avg_task else 0.0
    if n_rows and n_rows < broadcast_rows:
        rec = {"strategy": "broadcast", "n_salts": 1}
    elif skew_factor > straggler_factor:
        rec = {
            "strategy": "salt",
            "n_salts": min(parallelism, math.ceil(skew_factor)),
        }
    else:
        rec = {"strategy": "none", "n_salts": 1}
    return {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "avg_per_key": (n_rows / n_keys) if n_keys else 0.0,
        "top": hitters,
        "max_share": (mx / n_rows) if n_rows else 0.0,
        "skew_factor": skew_factor,
        "recommendation": rec,
    }
