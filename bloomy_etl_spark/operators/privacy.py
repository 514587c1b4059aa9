"""Keyed pseudonymization: release joinable tables without real ids.

The release-engineering counterpart of the PII scrub
(``functions/text.py``): the scrub removes identifiers from free text;
this replaces identifier COLUMNS with deterministic keyed tokens so a
released dataset keeps its referential integrity — the same
``(key, value)`` maps to the same token in every table, so joins,
grouping, and distinct counts still work in token space — while the
raw ids never leave the perimeter. Re-identification requires the key
(or brute force over the id domain: for low-entropy ids the key is the
entire protection — treat it as a secret, rotate it per release).

Spark shape: a pure per-row JVM projection (``md5`` over the
key-prefixed value) — no shuffle, no UDF, pipelines with the scan at
any scale, and the token function is engine-portable (DuckDB replays it
verbatim — t2:q99 hash-gates a full tokenized-join release).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(df: DataFrame, cols: Sequence[str], key: str,
                 token_len: int = 16) -> DataFrame:
    """Replace each column in ``cols`` with a deterministic keyed token:
    lowercase-hex ``md5("<key>:<value>")`` truncated to ``token_len``
    chars (64 bits at the default 16 — collision-safe to ~10⁸ distinct
    values per column; raise it for larger id spaces). NULL stays NULL
    (``concat`` null-propagation), so outer-join and missing-id
    semantics survive tokenization unchanged."""
    if not 1 <= int(token_len) <= 32:
        raise ValueError(f"token_len must be in [1, 32], got {token_len}")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    out = df
    for c in cols:
        tok = F.substring(
            F.md5(F.concat(F.lit(f"{key}:"), F.col(c).cast("string"))),
            1, int(token_len),
        )
        out = out.withColumn(c, tok)
    return out
