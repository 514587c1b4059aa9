"""Join-order advisor (plans/joinorder.py): estimate accuracy in the
exact KMV regime, greedy order quality on an asymmetric star schema,
strategy hints, and graph validation."""

from __future__ import annotations

import pytest

from bloomy_etl_spark.plans.joinorder import JoinEdge, advise_join_order


def _star(spark):
    """Star schema where join order matters: facts(50k) ⋈ dim_small(20)
    ⋈ dim_filtered(5 of 1000 match facts)."""
    facts = spark.range(50_000).selectExpr(
        "id AS f_id", "id % 20 AS small_key", "id % 5 AS rare_key"
    )
    dim_small = spark.range(20).selectExpr("id AS s_key", "id * 2 AS s_val")
    # only keys 0..4 of this dimension ever match the facts
    dim_rare = spark.range(1000).selectExpr("id AS r_key", "id * 3 AS r_val")
    return {"facts": facts, "dim_small": dim_small, "dim_rare": dim_rare}


_EDGES = [
    JoinEdge("facts", "small_key", "dim_small", "s_key"),
    JoinEdge("facts", "rare_key", "dim_rare", "r_key"),
]


def test_estimates_exact_in_small_regime(spark):
    t = _star(spark)
    plan = advise_join_order(t, _EDGES, k=4096)
    # start = smallest table; both dims broadcast-hinted
    assert plan["start"] == "dim_small"
    assert {s["strategy"] for s in plan["steps"]} == {"broadcast"}
    # final estimate equals the true three-way join size (all key sets
    # are below k, multiplicities are perfectly uniform)
    actual = (
        t["facts"]
        .join(t["dim_small"], t["facts"]["small_key"] == t["dim_small"]["s_key"])
        .join(t["dim_rare"], t["facts"]["rare_key"] == t["dim_rare"]["r_key"])
        .count()
    )
    assert plan["steps"][-1]["est_rows"] == pytest.approx(actual, rel=1e-6)


def test_greedy_prefers_reductive_join_first(spark):
    # chain graph: big ⋈ filter_dim (reduces 10×) ⋈ expand_dim (expands
    # 4×): greedy must pick the reductive edge before the expanding one
    big = spark.range(10_000).selectExpr("id AS b_id", "id % 100 AS fk",
                                         "id % 50 AS ek")
    filt = spark.range(10).selectExpr("id AS fk2")          # matches 10/100
    expand = spark.range(200).selectExpr("id % 50 AS ek2")  # 4 rows per key
    tables = {"big": big, "filt": filt, "expand": expand}
    edges = [
        JoinEdge("big", "fk", "filt", "fk2"),
        JoinEdge("big", "ek", "expand", "ek2"),
    ]
    plan = advise_join_order(tables, edges, k=4096)
    # the reductive dimension enters the pipeline before the expanding
    # one (either as the start table or as the earlier step)
    assert plan["order"].index("filt") < plan["order"].index("expand")
    assert plan["order"][-1] == "expand"
    # the final intermediate is the true three-way join size
    assert plan["steps"][-1]["est_rows"] == pytest.approx(4000.0, rel=1e-6)


def test_shuffle_hint_above_threshold(spark):
    t = _star(spark)
    plan = advise_join_order(t, _EDGES, k=512, broadcast_rows=100)
    by_right = {s["right"]: s["strategy"] for s in plan["steps"]}
    # dim_small is the start table; the two stepped-in tables both
    # exceed the tiny threshold → shuffle
    assert plan["start"] == "dim_small"
    assert by_right == {"facts": "shuffle", "dim_rare": "shuffle"}


def test_validation_errors(spark):
    t = _star(spark)
    with pytest.raises(ValueError, match="no edges"):
        advise_join_order(t, [])
    with pytest.raises(ValueError, match="unknown tables"):
        advise_join_order(t, [JoinEdge("facts", "x", "nope", "y")])
    # disconnected: an island table is never reachable
    island = dict(t)
    island["lonely"] = t["dim_small"].selectExpr("s_key AS l_key")
    with pytest.raises(ValueError, match="disconnected.*lonely"):
        advise_join_order(island, _EDGES)
