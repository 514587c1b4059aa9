"""Keyed pseudonymization (operators/privacy.py): determinism across
tables (referential integrity), NULL propagation, key sensitivity, and
fixture-scale collision-freedom. The full tokenized-join release is
hash-gated as t2:q99."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.privacy import pseudonymize
from bloomy_etl_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_referential_integrity_across_tables(spark):
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey")
    tc = pseudonymize(cust, ["c_custkey"], "k1")
    to = pseudonymize(orders, ["o_custkey"], "k1")
    # every order's token resolves to exactly the customer it came from:
    # the tokenized join has the same row count as the plaintext join
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    tok = to.join(tc, to.o_custkey == tc.c_custkey).count()
    assert tok == plain
    # and tokenization is injective on the fixture id space
    assert tc.distinct().count() == cust.distinct().count()


def test_null_propagates_and_key_changes_token(spark):
    df = spark.createDataFrame([(1,), (None,)], "uid int")
    a = pseudonymize(df, ["uid"], "ka").collect()
    b = pseudonymize(df, ["uid"], "kb").collect()
    toks_a = {r["uid"] for r in a}
    toks_b = {r["uid"] for r in b}
    assert None in toks_a and None in toks_b  # NULL stays NULL
    assert (toks_a - {None}) != (toks_b - {None})  # key matters
    one = next(t for t in toks_a if t is not None)
    assert len(one) == 16 and int(one, 16) >= 0  # hex token, default len


def test_validation(spark):
    df = spark.createDataFrame([(1,)], "uid int")
    with pytest.raises(ValueError, match="token_len"):
        pseudonymize(df, ["uid"], "k", token_len=0)
    with pytest.raises(ValueError, match="not in DataFrame"):
        pseudonymize(df, ["nope"], "k")


def test_pure_projection_plan(spark):
    df = load_table(spark, SF_SMOKE, "orders")
    out = pseudonymize(df, ["o_custkey"], "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # tokenization pipelines with the scan
