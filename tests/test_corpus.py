"""Differential test: every declared query vs the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from bloomy_etl_spark.operators.relational import ORACLE_SQL, QUERIES

from tests.conftest import SF_ORACLE
from tests.oracle import compare, register_duck_views


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_ORACLE)
    df = QUERIES[name](spark, SF_ORACLE)
    assert name in ORACLE_SQL, f"{name} missing oracle SQL"
    compare(df, duck, ORACLE_SQL[name])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_nonempty(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.limit(1).count() == 1, f"{name} returned no rows at sf0.01"
