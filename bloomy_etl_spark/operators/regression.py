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

__all__ = ["linreg_by_group", "fast_sigmoid", "logreg_gd_train",
           "logreg_score"]


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


# ---------------------------------------------------------------------------
# Distributed logistic regression (full-batch gradient descent) — the
# model-based quality-filter primitive (fastText/CCNet-style classifier
# scoring of a corpus, trained IN the engine).
#
# Iterative-algorithm shape = k-means (clustering.py): driver state is
# the weight vector (k+1 floats), each round is ONE hash aggregate of
# k+1 gradient sums with map-side combine — nothing driver-side ever
# touches corpus rows, and per-round shuffle is k+1 doubles per task.
#
# Engine-exact determinism (what lets a SQL oracle replay training):
#
# * the link is the RATIONAL "fast sigmoid" σ(z) = 0.5 + 0.5·z/(1+|z|)
#   — algebraic ops only (no libm exp, whose last-ulp behavior differs
#   between engines), same IEEE op sequence everywhere;
# * z = ((w0·x0 + w1·x1) + w2·x2) + … is a fixed left-associated fold,
#   written identically in the oracle;
# * weights are FLOOR-quantized to ``quant_dp`` decimals after every
#   update (the k-means centroid trick), so the engines' different
#   gradient-sum accumulation orders (~1e-13 apart over thousands of
#   rows) collapse onto the same grid point before they can influence
#   the next round;
# * features should be exact doubles (integer counts scaled by powers
#   of TWO — exponent shifts, no rounding), making round 1's gradient
#   sums exactly order-independent (all terms dyadic rationals).
# ---------------------------------------------------------------------------


def fast_sigmoid(z):
    """Rational sigmoid 0.5 + 0.5·z/(1+|z|): same range/monotonicity as
    the logistic link, zero transcendental calls — bit-identical across
    engines for identical z."""
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def _margin(feature_cols: Sequence[str], weights: Sequence[float]):
    z = F.lit(float(weights[0])) * F.col(feature_cols[0]).cast("double")
    for c, w in zip(feature_cols[1:], weights[1:]):
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    return z


def logreg_gd_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    rounds: int = 3,
    lr: float = 1.0 / 1024,
    quant_dp: int = 6,
) -> list[float]:
    """Full-batch GD on the fast-sigmoid logistic objective; returns the
    trained weights (one per feature column, bias = an explicit 1.0
    feature column). ``lr`` should be a power of two so the update's
    scaling is exact."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if not feature_cols:
        raise ValueError("need at least one feature column")
    q = 10 ** quant_dp
    w = [0.0] * len(feature_cols)
    y = F.col(label_col).cast("double")
    for _ in range(rounds):
        err = fast_sigmoid(_margin(feature_cols, w)) - y
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col(c).cast("double") * err).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        n = float(row["n"])
        if n == 0:
            raise ValueError("logreg_gd_train: empty input")
        import math

        w = [
            math.floor((w[j] - lr * float(row[f"g{j}"]) / n) * q) / q
            for j in range(len(feature_cols))
        ]
    return w


def logreg_score(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    *,
    out_col: str = "score",
) -> DataFrame:
    """Map-side scoring: adds ``out_col`` = fast_sigmoid(w·x). Weights
    ship as expression literals (the k-means centroid pattern); no
    shuffle, no driver round-trips."""
    if len(weights) != len(feature_cols):
        raise ValueError(
            f"{len(weights)} weights for {len(feature_cols)} features"
        )
    return df.withColumn(
        out_col, fast_sigmoid(_margin(feature_cols, weights))
    )
