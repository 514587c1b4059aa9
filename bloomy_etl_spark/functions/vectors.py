"""Vector (embedding) column expressions.

Built on Spark's higher-order array functions (``zip_with`` +
``aggregate``) — JVM-side, no Python crossing, linear in dimension. Floats
are cast to double *before* multiplication in index order, matching the
explicit DuckDB oracle formula ``list_dot_product(a,b) /
(sqrt(list_dot_product(a,a)) * sqrt(list_dot_product(b,b)))`` so both
engines accumulate identically.

Scale: brute-force cosine is O(n·d) per query vector and embarrassingly
parallel; for all-pairs work use the LSH bucketing in
``operators/similarity.py`` to bound the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize once at ingest so downstream cosine = plain dot —
    the cheap trick that halves ANN compute at scale."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)
