"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator to a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
the t2 correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from bloomy_etl_spark.operators.bloomy_queries import BLOOMY_ORACLE_SQL, BLOOMY_QUERIES
from bloomy_etl_spark.operators.llm_queries import LLM_ORACLE_SQL, LLM_QUERIES
from bloomy_etl_spark.operators.relational import ORACLE_SQL, QUERIES

ALL_QUERIES = {**QUERIES, **BLOOMY_QUERIES, **LLM_QUERIES}
ALL_ORACLES = {**ORACLE_SQL, **BLOOMY_ORACLE_SQL, **LLM_ORACLE_SQL}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 pricing summary) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ALL_ORACLES)
