"""Corrupt-parquet resilience (sources/resilient.py): skip mode reads
everything readable, fail mode fails, and the census flags exactly the
broken files with the reason."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.sources.resilient import (
    corrupt_parquet_census,
    read_parquet_resilient,
)


@pytest.fixture(scope="module")
def mixed_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mixed")
    spark.createDataFrame([(i, f"v{i}") for i in range(100)],
                          "id long, v string") \
        .coalesce(1).write.parquet(str(d / "good1"))
    spark.createDataFrame([(i, f"w{i}") for i in range(100, 150)],
                          "id long, v string") \
        .coalesce(1).write.parquet(str(d / "good2"))
    # flatten: move the part files up, then plant corrupt siblings
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(str(d / "good*" / "*.parquet")))):
        shutil.move(f, str(d / f"part-{i}.parquet"))
    for sub in ("good1", "good2"):
        shutil.rmtree(str(d / sub))
    (d / "garbage.parquet").write_bytes(b"this is not parquet at all")
    # valid magic at the head, truncated body + missing footer magic
    real = (d / "part-0.parquet").read_bytes()
    (d / "truncated.parquet").write_bytes(real[: len(real) // 2])
    return str(d)


def test_skip_reads_all_valid_rows(spark, mixed_dir):
    df = read_parquet_resilient(spark, mixed_dir + "/*.parquet",
                                schema="id long, v string")
    assert df.count() == 150
    assert df.agg(F.max("id")).collect()[0][0] == 149


def test_fail_mode_propagates(spark, mixed_dir):
    with pytest.raises(Exception):
        read_parquet_resilient(spark, mixed_dir + "/*.parquet",
                               schema="id long, v string",
                               on_corrupt="fail").count()


def test_census_flags_exactly_the_bad_files(spark, mixed_dir):
    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in corrupt_parquet_census(
                spark, mixed_dir + "/*.parquet").collect()}
    assert len(rows) == 4
    assert rows["part-0.parquet"]["ok"] and rows["part-1.parquet"]["ok"]
    assert not rows["garbage.parquet"]["ok"]
    assert "magic" in rows["garbage.parquet"]["error"]
    assert not rows["truncated.parquet"]["ok"]


def test_validation(spark):
    with pytest.raises(ValueError, match="on_corrupt"):
        read_parquet_resilient(spark, "/tmp/x", on_corrupt="quarantine")
