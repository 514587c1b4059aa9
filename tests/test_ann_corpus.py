"""Differential test: ANN-compression queries (q101–q104) vs DuckDB at
sf0.01 — the same full train/encode/search CTE replays the driver's t2
gate runs."""

from __future__ import annotations

import pytest

from bloomy_etl_spark.operators.ann_queries import ANN_ORACLE_SQL, ANN_QUERIES

from tests.conftest import SF_ORACLE
from tests.oracle import compare, register_duck_views


@pytest.mark.parametrize("name", sorted(ANN_QUERIES))
def test_ann_query_matches_oracle(spark, duck, name):
    assert name in ANN_ORACLE_SQL, f"{name} must be hash-gated"
    register_duck_views(duck, SF_ORACLE)
    df = ANN_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ANN_ORACLE_SQL[name])


@pytest.mark.parametrize("name", sorted(ANN_QUERIES))
def test_ann_query_nonempty(spark, name):
    assert ANN_QUERIES[name](spark, SF_ORACLE).limit(1).count() == 1


def test_q103_drops_something(spark):
    """The 0.35 threshold is calibrated to make the kept set non-trivial
    on the fixture (a trivially all-kept output would gate nothing)."""
    out = ANN_QUERIES["q103_semdedup_kept"](spark, SF_ORACLE)
    kept = [r["kept"] for r in out.collect()]
    assert 0 < sum(kept) < len(kept)


def test_q104_adc_is_upper_bounded_by_probe_set(spark):
    """Every returned neighbor must live in a probed cluster: rank ≤ 5,
    exactly 5 rows per query (nprobe=8 clusters always hold ≥5
    candidates on the fixture)."""
    out = ANN_QUERIES["q104_ivfpq_topk"](spark, SF_ORACLE).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3, 4, 5], f"query {qid}: {ranks}"
