"""Differential test: bloomy pixel-pipeline queries vs DuckDB at sf0.01."""

from __future__ import annotations

import pytest

from bloomy_etl_spark.operators.bloomy_queries import BLOOMY_ORACLE_SQL, BLOOMY_QUERIES

from tests.conftest import SF_ORACLE
from tests.oracle import compare, register_duck_views


@pytest.mark.parametrize("name", sorted(BLOOMY_QUERIES))
def test_bloomy_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_ORACLE)
    df = BLOOMY_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, BLOOMY_ORACLE_SQL[name])


@pytest.mark.parametrize("name", sorted(BLOOMY_QUERIES))
def test_bloomy_query_nonempty(spark, name):
    assert BLOOMY_QUERIES[name](spark, SF_ORACLE).limit(1).count() == 1
