"""The Python-checked validation set from SURVEY.md §2.10 — operators
whose syntax differs across engines (so they sit outside the SQL-text
corpus) but whose values must still agree with DuckDB / ground truth:

  * exact ``median`` (A7) — Spark's median == DuckDB's on the fixtures;
  * ``percentile_approx`` — sketch, checked against the exact quantile
    with tolerance;
  * ``approx_count_distinct`` — HLL sketch, within 5% of exact;
  * JSON path access on ``events.props`` (X13/X14) — get_json_object vs
    DuckDB json_extract.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE
from tests.oracle import register_duck_views


@pytest.fixture(scope="module")
def lineitem(spark):
    return load_table(spark, SF_ORACLE, "lineitem")


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_ORACLE, "events")


def test_exact_median_matches_duckdb(spark, duck, lineitem):
    register_duck_views(duck, SF_ORACLE)
    got = {
        r["l_returnflag"]: r["med"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.median("l_quantity").alias("med"))
        .collect()
    }
    want = dict(
        duck.execute(
            "SELECT l_returnflag, median(l_quantity) FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], float(want[k]), rel_tol=1e-9), k


def test_percentile_approx_near_exact(spark, duck, lineitem):
    register_duck_views(duck, SF_ORACLE)
    approx = lineitem.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p")
    ).first()["p"]
    exact = duck.execute(
        "SELECT quantile_cont(l_extendedprice, 0.5) FROM lineitem"
    ).fetchone()[0]
    assert abs(approx - float(exact)) / float(exact) < 0.01


def test_approx_count_distinct_within_5pct(spark, duck, events):
    register_duck_views(duck, SF_ORACLE)
    approx = events.agg(F.approx_count_distinct("user_id").alias("n")).first()["n"]
    exact = duck.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert abs(approx - exact) / exact < 0.05


def test_json_props_access_matches_duckdb(spark, duck, events):
    register_duck_views(duck, SF_ORACLE)
    got = {
        r["event_type"]: r["k_sum"]
        for r in events.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_sum")
        )
        .collect()
    }
    want = dict(
        duck.execute(
            "SELECT event_type, SUM(CAST(json_extract(props, '$.k') AS BIGINT))"
            " FROM events GROUP BY 1"
        ).fetchall()
    )
    assert got == {k: int(v) for k, v in want.items()}
