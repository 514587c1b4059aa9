"""Training-data export: sharded JSONL and WebDataset tar writers — the
inverse of ``sources/shards.py`` (a pipeline that can only READ the
interchange formats is half a pipeline; the curated corpus has to ship
back out in them).

Layout contract (both formats): documents are assigned to shards by
``pmod(xxhash64(id), n_shards)`` — deterministic, reshuffle-invariant,
and independent of input partitioning, so a re-export of the same rows
produces byte-stable shard MEMBERSHIP (within-shard order is pinned by
sorting on the id). One ``repartition(n_shards, shard)`` moves each
document exactly once; each shard writes in a single task via
``applyInPandas`` (Arrow-batched), so worker memory bounds shard size,
not corpus size. A ``manifest.json`` (shard → rows, bytes, sha256)
writes last — readers that require the manifest can treat its presence
as the commit marker.

Scale: n_shards is the parallelism unit for downstream loaders (the
WebDataset convention); size shards to ~100 MB–1 GB so object-store
request overhead amortizes. The writers are plain-filesystem (local
paths in tests, any ``os``-mountable FS in deployment).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    return df.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )


def _fill_empty_shards(path: str, entries: list[dict], n_shards: int,
                       suffix: str, empty_payload: bytes) -> list[dict]:
    """Write an empty shard file for every id in [0, n_shards) that got
    no rows (hash assignment leaves small exports with holes), so the
    ``shard-NNNNN`` layout a reader enumerates from the manifest's
    ``n_shards`` is total — no missing-file surprises."""
    present = {e["shard"] for e in entries}
    for i in range(n_shards):
        fname = f"shard-{i:05d}.{suffix}"
        if fname in present:
            continue
        with open(os.path.join(path, fname), "wb") as f:
            f.write(empty_payload)
        entries.append(
            {
                "shard": fname,
                "rows": 0,
                "bytes": len(empty_payload),
                "sha256": hashlib.sha256(empty_payload).hexdigest(),
            }
        )
    return entries


def _empty_tar_bytes() -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w"):
        pass
    return buf.getvalue()


def _write_manifest(path: str, entries: list[dict],
                    n_shards: int) -> None:
    entries = sorted(entries, key=lambda e: e["shard"])
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(
            {
                # the REQUESTED shard count — every shard-NNNNN file for
                # NNNNN < n_shards exists (empty shards are written out),
                # so enumerating from this field is always safe
                "n_shards": n_shards,
                "total_rows": sum(e["rows"] for e in entries),
                "shards": entries,
            },
            f,
            indent=1,
        )


def write_jsonl_shards(df: DataFrame, path: str, n_shards: int,
                       id_col: str = "doc_id") -> dict:
    """Export ``df`` as ``shard-NNNNN.jsonl`` files + manifest.

    Rows serialize as one JSON object per line with the DataFrame's
    column names; within a shard, lines are ordered by ``id_col`` (total
    order = deterministic bytes). Returns the manifest dict.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(id_col, kind="mergesort")
        buf = io.StringIO()
        for rec in pdf[cols].to_dict(orient="records"):
            buf.write(json.dumps(rec, ensure_ascii=False, sort_keys=True))
            buf.write("\n")
        data = buf.getvalue().encode("utf-8")
        fname = f"shard-{shard:05d}.jsonl"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "shard": [fname],
                "rows": [len(pdf)],
                "bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
            }
        )

    assigned = _assign_shard(df, id_col, n_shards).repartition(
        n_shards, "__shard"
    )
    entries = (
        assigned.groupBy("__shard")
        .applyInPandas(
            lambda pdf: write_shard(pdf),
            schema="shard string, rows long, bytes long, sha256 string",
        )
        .collect()
    )
    manifest = _fill_empty_shards(
        path, [r.asDict() for r in entries], n_shards, "jsonl", b""
    )
    _write_manifest(path, manifest, n_shards)
    return {"n_shards": n_shards, "total_rows": sum(e["rows"] for e in manifest)}


def write_webdataset(samples: DataFrame, path: str, n_shards: int,
                     key_col: str = "sample_key") -> dict:
    """Export grouped samples (``sample_key``, ``parts: map<ext,binary>``
    — the ``sources/shards.py::group_samples`` shape) as WebDataset tar
    shards ``shard-NNNNN.tar`` + manifest.

    Members are written as ``<sample_key>.<ext>`` with all members of a
    sample ADJACENT (the WebDataset grouping guarantee downstream
    readers rely on), samples ordered by key and exts ordered within a
    sample — deterministic member order, hence stable shard checksums.
    Fixed member metadata (mtime 0, uid/gid 0) keeps re-exports
    byte-identical.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    os.makedirs(path, exist_ok=True)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _, row in pdf.iterrows():
                parts = row["parts"]
                for ext in sorted(parts.keys()):
                    payload = bytes(parts[ext])
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(payload))
                n += 1
        data = buf.getvalue()
        fname = f"shard-{shard:05d}.tar"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "shard": [fname],
                "rows": [n],
                "bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
            }
        )

    assigned = _assign_shard(samples, key_col, n_shards).repartition(
        n_shards, "__shard"
    )
    entries = (
        assigned.groupBy("__shard")
        .applyInPandas(
            lambda pdf: write_shard(pdf),
            schema="shard string, rows long, bytes long, sha256 string",
        )
        .collect()
    )
    manifest = _fill_empty_shards(
        path, [r.asDict() for r in entries], n_shards, "tar", _empty_tar_bytes()
    )
    _write_manifest(path, manifest, n_shards)
    return {"n_shards": n_shards, "total_rows": sum(e["rows"] for e in manifest)}
