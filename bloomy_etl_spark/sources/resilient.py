"""Corrupt-file resilience at the parquet ingest boundary.

At 100 TB a corpus arrives as millions of files from crawlers and
upstream jobs; a handful WILL be truncated or garbage, and the default
reader turns one bad footer into a dead week-long job. Two tools, same
quarantine posture as ``read_jsonl_corpus`` / ``read_webdataset``:

* :func:`read_parquet_resilient` — the read path. ``on_corrupt="skip"``
  uses the per-relation ``ignoreCorruptFiles`` datasource option (no
  session-wide conf mutation, so concurrent strict reads stay strict);
  corrupt files silently drop out of the scan, which is why the census
  below exists. ``schema=`` pins the contract so a dropped file can't
  flip inferred types.

* :func:`corrupt_parquet_census` — makes the loss COUNTABLE: a
  distributed pass (``binaryFile`` → Arrow-batched footer validation
  with pyarrow, one task per file batch — no driver loop) returning one
  row per file with ``ok`` / ``error``. Alert on ``ok = false`` counts,
  then move on; the corpus never blocks.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CENSUS_SCHEMA = "path string, n_bytes long, ok boolean, error string"


def read_parquet_resilient(spark: SparkSession, path: str,
                           schema: str | None = None,
                           on_corrupt: str = "skip") -> DataFrame:
    """Read a parquet glob, surviving corrupt/truncated member files.

    ``on_corrupt="skip"`` drops unreadable files from the scan (the
    at-scale posture — pair with :func:`corrupt_parquet_census` to
    count what was lost); ``"fail"`` keeps Spark's default
    fail-the-job behavior for pipelines where silent loss is worse
    than a rerun."""
    if on_corrupt not in ("skip", "fail"):
        raise ValueError(f"on_corrupt must be 'skip' or 'fail', got"
                         f" {on_corrupt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if on_corrupt == "skip":
        reader = reader.option("ignoreCorruptFiles", "true")
    return reader.parquet(path)


def corrupt_parquet_census(spark: SparkSession, path: str) -> DataFrame:
    """One row per file under ``path`` (glob OK): (path, n_bytes, ok,
    error). Validation is structural — magic bytes at both ends plus a
    full pyarrow footer/metadata parse — and runs where the bytes are
    (Arrow-batched over a ``binaryFile`` scan), so the census scales
    with the cluster, not the driver."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                ok, err = True, None
                if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
                    ok, err = False, "missing PAR1 magic (truncated or not parquet)"
                else:
                    try:
                        pq.ParquetFile(io.BytesIO(data)).metadata  # noqa: B018
                    except Exception as exc:  # noqa: BLE001 — census, not crash
                        ok, err = False, f"{type(exc).__name__}: {exc}"[:200]
                out.append({"path": p, "n_bytes": len(data), "ok": ok,
                            "error": err})
            yield pd.DataFrame(out,
                               columns=["path", "n_bytes", "ok", "error"])

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        check, schema=CENSUS_SCHEMA
    )
