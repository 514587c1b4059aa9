"""One-pass distributed linear regression (closed-form OLS per group).

The trend-fitting primitive an analytics engine owes its users (per-
series slopes, drift rates, simple forecasts) — done the way a
distributed engine should: simple linear regression has a CLOSED FORM
over five sufficient statistics (Σx, Σy, Σx², Σy², Σxy), so the whole
fit is ONE hash aggregate — no gradient loop, no driver iteration, no
second pass for R².  Slope/intercept/R² come out of Cramer's rule on
the normal equations:

    b1 = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²ᵗᵒᵗ)
    b0 = (Σy − b1·Σx) / n
    R² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

Everything is polynomial arithmetic over the sums — no transcendental
functions — so a SQL engine replays it with identical expressions
(t2:q98).  Degenerate groups (constant x) return NULL coefficients
rather than ±inf.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["linreg_by_group"]


def linreg_by_group(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    *,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group OLS of ``y`` on ``x``: adds ``n, slope, intercept,
    r2`` (coefficients rounded to ``round_dp``).  Rows where either
    side is NULL are excluded from the fit (SQL aggregate semantics)."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = F.when(x.isNotNull() & y.isNotNull(), True)
    g = df.groupBy(*keys).agg(
        F.count(F.when(both, 1)).alias("n"),
        F.sum(F.when(both, x)).alias("sx"),
        F.sum(F.when(both, y)).alias("sy"),
        F.sum(F.when(both, x * x)).alias("sxx"),
        F.sum(F.when(both, y * y)).alias("syy"),
        F.sum(F.when(both, x * y)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy      # n² · cov
    var_x = n * sxx - sx * sx      # n² · var(x)
    var_y = n * syy - sy * sy
    slope = F.when(var_x > 0, cov_n / var_x)
    intercept = F.when(var_x > 0, (sy - (cov_n / var_x) * sx) / n)
    r2 = F.when(
        (var_x > 0) & (var_y > 0), (cov_n * cov_n) / (var_x * var_y)
    )
    return g.select(
        *keys,
        F.col("n"),
        F.round(slope, round_dp).alias("slope"),
        F.round(intercept, round_dp).alias("intercept"),
        F.round(r2, round_dp).alias("r2"),
    )
