"""WebDataset tar-shard + JSONL ingestion (sources/shards.py)."""

from __future__ import annotations

import gzip
import io
import json
import tarfile

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.sources.shards import (
    group_samples,
    read_jsonl_corpus,
    read_webdataset,
    to_media_table,
)


def _write_shard(path, samples):
    """samples: list of (member_name, payload bytes)."""
    with tarfile.open(path, "w") as tf:
        for name, payload in samples:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    _write_shard(
        d / "shard-000.tar",
        [
            ("0001.jpg", b"\xff\xd8fakejpeg"),
            ("0001.txt", b"a cat photo"),
            ("0001.json", json.dumps({"w": 64}).encode()),
            ("0002.jpg", b"\x89PNGfake"),
            ("0002.txt", b"a dog photo"),
        ],
    )
    _write_shard(
        d / "shard-001.tar",
        [
            ("sub/0003.seg.png", b"segmask"),
            ("sub/0003.txt", b"nested sample"),
        ],
    )
    return str(d)


class TestWebdataset:
    def test_members_and_grouping_rule(self, spark, shard_dir):
        m = read_webdataset(spark, shard_dir + "/*.tar")
        rows = m.collect()
        assert len(rows) == 7
        by_key = {}
        for r in rows:
            by_key.setdefault(r["sample_key"], []).append(r["ext"])
        assert sorted(by_key["0001"]) == ["jpg", "json", "txt"]
        assert sorted(by_key["0002"]) == ["jpg", "txt"]
        # first-dot rule + directory prefix preserved
        assert sorted(by_key["sub/0003"]) == ["seg.png", "txt"]
        # payload fidelity
        px = {(r["sample_key"], r["ext"]): bytes(r["payload"]) for r in rows}
        assert px[("0001", "txt")] == b"a cat photo"
        assert px[("sub/0003", "seg.png")] == b"segmask"

    def test_suffix_filter_prunes_in_task(self, spark, shard_dir):
        m = read_webdataset(spark, shard_dir + "/*.tar", suffix_filter=("txt",))
        assert sorted(r["ext"] for r in m.collect()) == ["txt", "txt", "txt"]

    def test_group_samples(self, spark, shard_dir):
        s = group_samples(read_webdataset(spark, shard_dir + "/*.tar"))
        got = {r["sample_key"]: r for r in s.collect()}
        assert got["0001"]["n_members"] == 3
        assert bytes(got["0001"]["parts"]["txt"]) == b"a cat photo"
        assert set(got["0002"]["parts"].keys()) == {"jpg", "txt"}

    def test_to_media_table_feeds_multimodal(self, spark, shard_dir):
        from bloomy_etl_spark.operators.multimodal import decode_stats

        s = group_samples(read_webdataset(spark, shard_dir + "/*.tar"))
        media = to_media_table(s, media_ext=("jpg",))
        rows = media.collect()
        assert {r["kind"] for r in rows} == {"image"}
        assert len(rows) == 2
        # the opaque payloads run through the real decode plumbing
        out = decode_stats(media.select("media_id", "kind", "payload")).collect()
        assert len(out) == 2 and all(r["n_bytes"] > 0 for r in out)


class TestJsonl:
    def test_read_with_quarantine(self, spark, tmp_path):
        p = tmp_path / "docs.jsonl.gz"
        lines = [
            json.dumps({"doc_id": 1, "text": "hello", "lang": "en", "source": "s0"}),
            "{ not json",
            json.dumps({"doc_id": 2, "text": "welt", "lang": "de", "source": "s1"}),
        ]
        with gzip.open(p, "wt") as f:
            f.write("\n".join(lines))
        df = read_jsonl_corpus(spark, str(p))
        # full-row collect: Spark refuses corrupt-record-ONLY queries over
        # raw JSON (the column exists only during parsing) — the loader
        # docstring pins this caveat
        rows = df.collect()
        good = [r for r in rows if r["_corrupt_record"] is None]
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert {r["doc_id"] for r in good} == {1, 2}
        assert len(bad) == 1
        # failfast path raises on the corrupt line
        with pytest.raises(Exception):
            read_jsonl_corpus(spark, str(p), quarantine=False).collect()
