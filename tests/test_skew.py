"""Key-skew diagnostics (tools/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.tools.skew import key_skew_report


def test_hot_key_detected_and_salt_sized(spark):
    # key 0 holds half the rows; the rest spread over 1000 keys
    df = spark.range(100_000).select(
        F.when(F.col("id") < 50_000, 0)
        .otherwise(F.col("id") % 1000 + 1)
        .alias("k")
    )
    rep = key_skew_report(df, ["k"], broadcast_rows=10)
    assert rep["n_rows"] == 100_000
    assert rep["top"][0]["key"] == (0,)
    assert rep["top"][0]["share"] == pytest.approx(0.5)
    assert rep["recommendation"]["strategy"] == "salt"
    par = spark.sparkContext.defaultParallelism
    # hottest key ≈ half the table ⇒ factor ≈ parallelism/2, capped
    assert 1 < rep["recommendation"]["n_salts"] <= par
    assert rep["recommendation"]["n_salts"] >= min(par, par // 2)


def test_uniform_keys_no_action(spark):
    df = spark.range(100_000).select((F.col("id") % 1000).alias("k"))
    rep = key_skew_report(df, ["k"], broadcast_rows=10)
    assert rep["recommendation"]["strategy"] == "none"
    assert rep["skew_factor"] < 2.0
    assert rep["n_keys"] == 1000
    assert rep["avg_per_key"] == pytest.approx(100.0)


def test_small_table_recommends_broadcast(spark):
    df = spark.range(100).select((F.col("id") % 3).alias("k"))
    rep = key_skew_report(df, ["k"])
    assert rep["recommendation"] == {"strategy": "broadcast", "n_salts": 1}


def test_empty_table(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    rep = key_skew_report(df, ["k"])
    assert rep["n_rows"] == 0 and rep["top"] == []
    assert rep["recommendation"]["strategy"] in ("none", "broadcast")
