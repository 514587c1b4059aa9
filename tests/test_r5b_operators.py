"""Round-5 surface, part 2: time-series gap filling (operators/
timeseries.py), grid-bucketed spatial radius join (operators/spatial.py)
and PageRank (operators/graph.py). The declared q80–q82 forms are
oracle-gated by the parametrized sweep in test_r5_operators; here we pin
operator semantics on hand-built inputs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.graph import pagerank
from bloomy_etl_spark.operators.spatial import radius_self_join
from bloomy_etl_spark.operators.timeseries import gapfill, time_bucket
from bloomy_etl_spark.plans.explain import assert_no_cartesian, plan_string


# ---------------------------------------------------------------------------
# gapfill
# ---------------------------------------------------------------------------
def _series(spark):
    # key A: observations at 1, 4, 6 — gaps [2,3] and [5]
    # key B: single observation (no gaps, no lead)
    rows = [("A", 1, 10.0), ("A", 4, 40.0), ("A", 6, 30.0), ("B", 7, 5.0)]
    return spark.createDataFrame(rows, "k string, day long, v double")


def _as_dict(df):
    return {(r["k"], r["day"]): (r["v"], r["observed"]) for r in df.collect()}


def test_gapfill_linear_hand_computed(spark):
    out = _as_dict(gapfill(_series(spark), ["k"], "day", "v", method="linear"))
    assert out[("A", 1)] == (10.0, True)
    assert out[("A", 2)] == (20.0, False)   # 10 + (40-10)*1/3
    assert out[("A", 3)] == (30.0, False)
    assert out[("A", 4)] == (40.0, True)
    assert out[("A", 5)] == (35.0, False)   # midpoint of 40 and 30
    assert out[("A", 6)] == (30.0, True)
    assert out[("B", 7)] == (5.0, True)
    assert len(out) == 7  # grid is exactly [min, max] per key


def test_gapfill_locf_and_null(spark):
    locf = _as_dict(gapfill(_series(spark), ["k"], "day", "v", method="locf"))
    assert locf[("A", 2)] == (10.0, False)
    assert locf[("A", 5)] == (40.0, False)
    nul = _as_dict(gapfill(_series(spark), ["k"], "day", "v", method="null"))
    assert nul[("A", 2)] == (None, False)
    assert nul[("A", 4)] == (40.0, True)


def test_gapfill_observed_rows_keep_exact_values(spark):
    for method in ("linear", "locf", "null"):
        out = gapfill(_series(spark), ["k"], "day", "v", method=method)
        obs = {(r["k"], r["day"]): r["v"]
               for r in out.filter("observed").collect()}
        assert obs == {("A", 1): 10.0, ("A", 4): 40.0, ("A", 6): 30.0,
                       ("B", 7): 5.0}


def test_gapfill_null_observation_propagates(spark):
    df = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 3, None), ("A", 5, 50.0)],
        "k string, day long, v double",
    )
    out = _as_dict(gapfill(df, ["k"], "day", "v", method="linear"))
    # the [3,5) span interpolates from a NULL observation → stays NULL
    assert out[("A", 2)][0] is None  # interp toward NULL
    assert out[("A", 3)] == (None, True)
    assert out[("A", 4)][0] is None
    assert out[("A", 5)] == (50.0, True)


def test_gapfill_step_and_bucket(spark):
    df = spark.createDataFrame(
        [("A", 0, 1.0), ("A", 21, 8.0)], "k string, day long, v double"
    )
    out = _as_dict(gapfill(df, ["k"], "day", "v", step=7, method="linear"))
    assert set(d for _, d in out) == {0, 7, 14, 21}
    assert out[("A", 7)] == (pytest.approx(1.0 + 7 * 7 / 21), False)
    # time_bucket aligns to stride starts, including negatives
    b = spark.range(1).select(
        time_bucket(7, F.lit(13).cast("long")).alias("a"),
        time_bucket(7, F.lit(-1).cast("long")).alias("b"),
    ).first()
    assert (b["a"], b["b"]) == (7, -7)


def test_gapfill_rejects_unknown_method(spark):
    with pytest.raises(ValueError, match="unknown method"):
        gapfill(_series(spark), ["k"], "day", "v", method="spline")


def test_gapfill_single_shuffle_plan(spark):
    plan = plan_string(gapfill(_series(spark), ["k"], "day", "v"))
    # one exchange for the per-key window; the dense grid is generated
    # map-side after it (no join, no second shuffle). "Exchange (" counts
    # tree nodes only (formatted explain repeats names in the detail
    # section).
    assert plan.count("Exchange (") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# radius_self_join
# ---------------------------------------------------------------------------
def _points(spark):
    # deterministic scatter incl. a cross-cell close pair (9,9)-(11,11)
    # and an identical-location pair (50,50) twice
    rows = [
        (1, 0.0, 0.0), (2, 3.0, 4.0), (3, 9.0, 9.0), (4, 11.0, 11.0),
        (5, 50.0, 50.0), (6, 50.0, 50.0), (7, 300.0, 300.0),
    ]
    return spark.createDataFrame(rows, "pid long, x double, y double")


def _naive_pairs(rows, radius):
    out = set()
    for i, (ia, xa, ya) in enumerate(rows):
        for ib, xb, yb in rows[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= radius**2:
                out.add((min(ia, ib), max(ia, ib), d2))
    return out


def test_radius_join_matches_naive(spark):
    pts = _points(spark)
    rows = [(r["pid"], r["x"], r["y"]) for r in pts.collect()]
    got = {(r["id_a"], r["id_b"], r["dist2"])
           for r in radius_self_join(pts, "pid", "x", "y", 6.0).collect()}
    assert got == _naive_pairs(rows, 6.0)
    # boundary inclusive: (1)-(2) at exactly distance 5
    got5 = {(r["id_a"], r["id_b"])
            for r in radius_self_join(pts, "pid", "x", "y", 5.0).collect()}
    assert (1, 2) in got5


def test_radius_join_exactly_once_and_larger_cell(spark):
    pts = _points(spark)
    out = radius_self_join(pts, "pid", "x", "y", 6.0, cell=40.0)
    rows = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert len(rows) == len(set(rows))  # no duplicate pairs, no distinct()
    naive = {(a, b) for a, b, _ in
             _naive_pairs([(r["pid"], r["x"], r["y"])
                           for r in pts.collect()], 6.0)}
    assert set(rows) == naive  # any cell >= radius is exhaustive


def test_radius_join_cell_below_radius_rejected(spark):
    with pytest.raises(ValueError, match="cell width"):
        radius_self_join(_points(spark), "pid", "x", "y", 10.0, cell=5.0)


def test_radius_join_plan_is_equi_join(spark):
    df = radius_self_join(_points(spark), "pid", "x", "y", 6.0)
    assert_no_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in plan_string(df)


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------
def _round_half_up(x: float, dp: int) -> float:
    """Spark's ROUND on doubles: HALF_UP over the shortest decimal repr
    (Java BigDecimal.valueOf semantics) — NOT Python round()'s half-even
    over the exact binary value."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _pagerank_reference(edges, damping, rounds, dp):
    """Sequential replay with the same quantization (dict-based)."""
    from collections import defaultdict

    w = defaultdict(float)
    for s, d_, wt in edges:
        w[(s, d_)] += wt
    outw = defaultdict(float)
    for (s, _), wt in w.items():
        outw[s] += wt
    nodes = sorted({s for s, _ in w} | {d_ for _, d_ in w})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(rounds):
        dm = sum(rank[v] for v in nodes if v not in outw)
        contrib = defaultdict(float)
        for (s, d_), wt in sorted(w.items()):
            contrib[d_] += rank[s] * (wt / outw[s])
        rank = {
            v: _round_half_up(
                (1 - damping) / n
                + damping * (contrib.get(v, 0.0) + dm / n),
                dp,
            )
            for v in nodes
        }
    return rank


def test_pagerank_uniform_on_symmetric_complete_graph(spark):
    nodes = list(range(4))
    edges = [(a, b, 1.0) for a in nodes for b in nodes if a != b]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, weight="w", rounds=5).collect()}
    assert all(v == pytest.approx(0.25) for v in got.values())
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_matches_sequential_reference(spark):
    # asymmetric weighted graph with a hub
    edges = [(1, 2, 1.0), (1, 3, 3.0), (2, 3, 1.0), (3, 1, 1.0),
             (4, 3, 2.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, weight="w", rounds=4).collect()}
    ref = _pagerank_reference(edges, 0.85, 4, 9)
    assert got == ref
    # 3 funnels its whole mass to 1, so 1 tops; 4 receives nothing
    assert got[1] > got[3] > got[2] > got[4]


def test_pagerank_dangling_mass_redistributed(spark):
    # 1 -> 2 and 2 dangles: without redistribution total rank decays
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, rounds=6).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    ref = _pagerank_reference([(1, 2, 1.0)], 0.85, 6, 9)
    assert got == ref


# ---------------------------------------------------------------------------
# scd2_asof_enrich
# ---------------------------------------------------------------------------
def _dim(spark):
    # key 1: three chained versions; key 2: single open version.
    rows = [
        (1, "bronze", 10, 20), (1, "silver", 20, 30), (1, "gold", 30, None),
        (2, "bronze", 5, None),
    ]
    return spark.createDataFrame(
        rows, "k long, tier string, eff_ts long, end_ts long"
    )


def test_scd2_asof_picks_version_in_force(spark):
    from bloomy_etl_spark.operators.joins import scd2_asof_enrich

    facts = spark.createDataFrame(
        [(1, 10), (1, 19), (1, 20), (1, 35), (2, 5), (2, 999)],
        "k long, ts long",
    )
    out = {(r["k"], r["ts"]): r["tier"]
           for r in scd2_asof_enrich(facts, _dim(spark), "k", "ts").collect()}
    assert out == {
        (1, 10): "bronze", (1, 19): "bronze",   # boundary: eff inclusive
        (1, 20): "silver",                       # end exclusive
        (1, 35): "gold",                         # open version
        (2, 5): "bronze", (2, 999): "bronze",
    }


def test_scd2_asof_left_keeps_prehistory_inner_drops(spark):
    from bloomy_etl_spark.operators.joins import scd2_asof_enrich

    facts = spark.createDataFrame([(1, 3), (1, 15)], "k long, ts long")
    left = scd2_asof_enrich(facts, _dim(spark), "k", "ts", how="left")
    rows = {r["ts"]: r["tier"] for r in left.collect()}
    assert rows == {3: None, 15: "bronze"}  # fact kept, NULL attributes
    inner = scd2_asof_enrich(facts, _dim(spark), "k", "ts", how="inner")
    assert [r["ts"] for r in inner.collect()] == [15]
    with pytest.raises(ValueError, match="how must be"):
        scd2_asof_enrich(facts, _dim(spark), "k", "ts", how="full")


def test_scd2_asof_zero_width_window_self_excludes(spark):
    from bloomy_etl_spark.operators.joins import scd2_asof_enrich

    # same-instant conflicting versions: [10,10) is empty, second wins
    dim = spark.createDataFrame(
        [(1, "a", 10, 10), (1, "b", 10, None)],
        "k long, tier string, eff_ts long, end_ts long",
    )
    facts = spark.createDataFrame([(1, 10), (1, 11)], "k long, ts long")
    out = scd2_asof_enrich(facts, dim, "k", "ts")
    assert out.count() == 2  # exactly one version each, no fan-out
    assert {r["tier"] for r in out.collect()} == {"b"}


# ---------------------------------------------------------------------------
# semantic_decontam
# ---------------------------------------------------------------------------
def test_semantic_decontam_flags_and_plan(spark):
    from bloomy_etl_spark.operators.similarity import semantic_decontam

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b"), (3, [0.9, 0.1], "a")],
        "vec_id long, embedding array<double>, label string",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = semantic_decontam(corpus, bench, 0.9, keep_cols=("label",))
    got = {r["vec_id"]: (r["contaminated"], r["max_sim"]) for r in out.collect()}
    assert got[1][0] and got[1][1] == pytest.approx(1.0)
    assert not got[2][0] and got[2][1] == pytest.approx(0.0)
    assert got[3][0]  # cos(0.9,0.1 vs 1,0) ≈ 0.9939 ≥ 0.9
    # the corpus side never shuffles: the only exchanges are the
    # benchmark's 1-row aggregate and its broadcast
    plan = plan_string(out)
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# golden_record survivorship
# ---------------------------------------------------------------------------
def test_golden_record_rules(spark):
    from bloomy_etl_spark.operators.survivorship import golden_record

    rows = [
        # entity 1: b appears twice (mode), latest obs at t=30
        (1, 10, "a", 5.0), (1, 20, "b", None), (1, 30, "b", 7.0),
        # entity 2: tie a/b 1-1 → mode breaks to larger value "b"
        (2, 10, "a", 1.0), (2, 20, "b", 2.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, c string, v double")
    out = {
        r["k"]: r
        for r in golden_record(
            df,
            ["k"],
            {
                "last_v": ("latest", "v", "t"),
                "first_c": ("earliest", "c", "t"),
                "top_c": ("mode", "c"),
                "peak": ("max", "v"),
                "n": ("count", "t"),
            },
        ).collect()
    }
    assert (out[1]["last_v"], out[1]["first_c"], out[1]["top_c"]) == (
        7.0, "a", "b",
    )
    assert out[1]["peak"] == 7.0 and out[1]["n"] == 3
    assert out[2]["top_c"] == "b"  # deterministic tie-break
    with pytest.raises(ValueError, match="no rules"):
        golden_record(df, ["k"], {})
    with pytest.raises(ValueError, match="unknown rule"):
        golden_record(df, ["k"], {"x": ("median", "v")})


def test_golden_record_single_aggregate_plan(spark):
    from bloomy_etl_spark.operators.survivorship import golden_record

    df = spark.createDataFrame([(1, 1, 2.0)], "k long, t long, v double")
    out = golden_record(
        df, ["k"],
        {"last_v": ("latest", "v", "t"), "peak": ("max", "v"),
         "n": ("count", "t")},
    )
    plan = plan_string(out)
    # every non-mode rule rides one hash aggregate: a single exchange,
    # no window, no join
    assert plan.count("Exchange (") == 1
    assert "Window" not in plan and "Join" not in plan


# ---------------------------------------------------------------------------
# assign_sequential_ids
# ---------------------------------------------------------------------------
def test_sequential_ids_match_global_rank(spark):
    from bloomy_etl_spark.operators.ids import assign_sequential_ids

    rows = [(i, float((i * 37) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v double").repartition(13)
    out = assign_sequential_ids(df, ["v", "k"]).collect()
    want = sorted(rows, key=lambda r: (r[1], r[0]))
    got = sorted(out, key=lambda r: r["seq_id"])
    assert [r["seq_id"] for r in got] == list(range(1, 501))  # contiguous
    assert [(r["k"], r["v"]) for r in got] == want            # rank order


def test_sequential_ids_start_pin_and_validation(spark):
    from bloomy_etl_spark.operators.ids import assign_sequential_ids

    df = spark.createDataFrame([(3,), (1,), (2,)], "k long")
    got = {r["k"]: r["seq_id"]
           for r in assign_sequential_ids(df, ["k"], start=100).collect()}
    assert got == {1: 100, 2: 101, 3: 102}
    unpinned = {r["k"]: r["seq_id"] for r in assign_sequential_ids(
        df, ["k"], pin=False).collect()}
    assert unpinned == {1: 1, 2: 2, 3: 3}
    assert assign_sequential_ids(
        spark.createDataFrame([], "k long"), ["k"]).count() == 0
    with pytest.raises(ValueError, match="total order"):
        assign_sequential_ids(df, [])


# ---------------------------------------------------------------------------
# linreg_by_group
# ---------------------------------------------------------------------------
def test_linreg_exact_line_and_degenerate(spark):
    from bloomy_etl_spark.operators.regression import linreg_by_group

    rows = (
        [("lin", float(x), 3.0 + 2.0 * x) for x in range(10)]     # exact line
        + [("flat", 5.0, float(v)) for v in range(5)]             # constant x
        + [("nul", float(x), None) for x in range(4)]             # all-NULL y
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in
           linreg_by_group(df, ["g"], "x", "y").collect()}
    assert (out["lin"]["slope"], out["lin"]["intercept"]) == (2.0, 3.0)
    assert out["lin"]["r2"] == 1.0
    assert out["flat"]["slope"] is None and out["flat"]["r2"] is None
    assert out["nul"]["n"] == 0 and out["nul"]["slope"] is None


def test_linreg_matches_numpy_polyfit(spark):
    import numpy as np

    from bloomy_etl_spark.operators.regression import linreg_by_group

    xs = [float((i * 17) % 23) for i in range(200)]
    ys = [1.5 * x - 4.0 + float((i * 7) % 11) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    got = linreg_by_group(df, ["g"], "x", "y").first()
    b1, b0 = np.polyfit(xs, ys, 1)
    assert got["slope"] == pytest.approx(b1, abs=1e-6)
    assert got["intercept"] == pytest.approx(b0, abs=1e-6)
    r = np.corrcoef(xs, ys)[0, 1]
    assert got["r2"] == pytest.approx(r * r, abs=1e-6)


# ---------------------------------------------------------------------------
# q86's integer z-score identity
# ---------------------------------------------------------------------------
def test_integer_zscore_identity_matches_float_zscore():
    """(n·x − S)² > 4·(n·Q − S²)  ⇔  |x−μ|/σ > 2 (population σ), checked
    over exhaustive small integer windows incl. the σ=0 edge the float
    form cannot evaluate."""
    import itertools

    for win in itertools.product(range(-3, 4), repeat=4):
        n = len(win)
        s, q = sum(win), sum(v * v for v in win)
        for x in win:
            int_flag = (n * x - s) ** 2 > 4 * (n * q - s * s)
            mu = s / n
            var = q / n - mu * mu
            if var <= 1e-12:
                assert not int_flag  # σ=0 ⇒ x==μ ⇒ z=0, never anomalous
            else:
                z = abs(x - mu) / math.sqrt(var)
                if abs(z - 2.0) > 1e-9:  # off the boundary float can blur
                    assert int_flag == (z > 2.0)


def test_bfs_hops_path_graph(spark):
    from bloomy_etl_spark.operators.graph import bfs_hops

    # path 1→2→3→4→5 plus unreachable 9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(edges, src, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # 9 unreachable
    # hop cap truncates the far tail
    capped = {r["node"]: r["dist"]
              for r in bfs_hops(edges, src, max_hops=2).collect()}
    assert capped == {1: 0, 2: 1, 3: 2}


def test_bfs_hops_multi_source_min_distance(spark):
    from bloomy_etl_spark.operators.graph import bfs_hops

    # diamond: distances are min over both seeds
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    src = spark.createDataFrame([(1,), (4,)], "node long")
    got = {r["node"]: r["dist"]
           for r in bfs_hops(edges, src, max_hops=5).collect()}
    assert got == {1: 0, 4: 0, 3: 1}  # 3 via 1; 2 has no inbound path
    with pytest.raises(ValueError, match="max_hops"):
        bfs_hops(edges, src, max_hops=-1)


def test_pagerank_multi_edges_combine(spark):
    # duplicate (1,2) edges must weigh like a single doubled edge
    dup = spark.createDataFrame(
        [(1, 2, 1.0), (1, 2, 1.0), (1, 3, 2.0), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, w double",
    )
    single = spark.createDataFrame(
        [(1, 2, 2.0), (1, 3, 2.0), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, w double",
    )
    a = {r["node"]: r["rank"] for r in pagerank(dup, weight="w").collect()}
    b = {r["node"]: r["rank"] for r in pagerank(single, weight="w").collect()}
    assert a == b
    assert a[2] == a[3]  # equal in-weight ⇒ equal rank by symmetry


def test_gapfill_observations_closer_than_step_densify_not_error(spark):
    """ADVICE r5: consecutive observations closer than ``step`` must
    degrade to densify-only output, not raise 'illegal sequence
    boundaries' mid-job."""
    rows = [("A", 0, 1.0), ("A", 1, 2.0), ("A", 10, 11.0)]
    df = spark.createDataFrame(rows, "k string, day long, v double")
    out = {(r["k"], r["day"]): (r["v"], r["observed"])
           for r in gapfill(df, ["k"], "day", "v",
                            method="locf", step=2).collect()}
    # both close observations survive as their own grid rows
    assert out[("A", 0)] == (1.0, True)
    assert out[("A", 1)] == (2.0, True)
    # the gap after day 1 still fills in step-2 strides
    assert out[("A", 3)] == (2.0, False)
    assert out[("A", 10)] == (11.0, True)


def test_assign_sequential_ids_leaves_no_cachemanager_entry(spark):
    """ADVICE r5: the pin must not accumulate session-lifetime cache
    entries (persist() registers in the CacheManager forever; the
    eager localCheckpoint pin must not)."""
    from bloomy_etl_spark.operators.ids import assign_sequential_ids

    cm = spark._jsparkSession.sharedState().cacheManager()
    df = spark.createDataFrame([(3,), (1,), (2,)], "x long")
    out = assign_sequential_ids(df, ["x"])
    got = {r["x"]: r["seq_id"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3}
    assert cm.isEmpty(), "assign_sequential_ids leaked a cached plan"


def test_binned_range_join_semi_plan_is_deterministic(spark):
    """ADVICE r5: left_semi must not key row identity on
    monotonically_increasing_id (nondeterministic under partial-stage
    recomputation) — the plan must contain no nondeterministic ids."""
    from bloomy_etl_spark.operators.joins import binned_range_join

    points = spark.createDataFrame([(1, 10), (1, 10), (2, 50)],
                                   "pid long, v long")
    intervals = spark.createDataFrame([(7, 5, 20)],
                                      "iid long, lo long, hi long")
    out = binned_range_join(points, intervals, "v", "lo", "hi", 8,
                            how="left_semi")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "monotonically_increasing_id" not in plan
    # semantics: duplicates preserved by multiplicity, not row ids
    assert sorted((r["pid"], r["v"]) for r in out.collect()) == \
        [(1, 10), (1, 10)]


class TestLogregGd:
    """Distributed logistic regression (regression.logreg_gd_train):
    objective decreases, scoring matches a NumPy replay of the same
    fast-sigmoid arithmetic, training is partition-invariant."""

    @pytest.fixture(scope="class")
    def sep(self, spark):
        # linearly separable in x1: y = 1 iff x1 > 0.5
        rows = [(i, 1.0, (i % 100) / 128.0, 1.0 if (i % 100) / 128.0 > 0.5 else 0.0)
                for i in range(400)]
        return spark.createDataFrame(
            rows, "id long, x0 double, x1 double, y double"
        )

    @staticmethod
    def _loss(df, cols, w):
        import math

        rows = df.collect()
        tot = 0.0
        for r in rows:
            z = sum(wi * r[c] for wi, c in zip(w, cols))
            p = min(max(0.5 + 0.5 * z / (1 + abs(z)), 1e-9), 1 - 1e-9)
            tot += -(r["y"] * math.log(p) + (1 - r["y"]) * math.log(1 - p))
        return tot / len(rows)

    def test_objective_decreases_and_separates(self, spark, sep):
        from bloomy_etl_spark.operators.regression import (
            logreg_gd_train,
            logreg_score,
        )

        cols = ["x0", "x1"]
        w0 = [0.0, 0.0]
        w5 = logreg_gd_train(sep, cols, "y", rounds=5, lr=1.0 / 4)
        assert self._loss(sep, cols, w5) < self._loss(sep, cols, w0)
        # the slope feature must carry positive weight (y grows with x1)
        assert w5[1] > 0
        scored = logreg_score(sep, cols, w5).collect()
        # higher-x1 rows must score higher on average than lower-x1 rows
        hi = [r["score"] for r in scored if r["x1"] > 0.5]
        lo = [r["score"] for r in scored if r["x1"] <= 0.5]
        assert sum(hi) / len(hi) > sum(lo) / len(lo)

    def test_score_matches_numpy_replay(self, spark, sep):
        from bloomy_etl_spark.operators.regression import (
            logreg_gd_train,
            logreg_score,
        )

        cols = ["x0", "x1"]
        w = logreg_gd_train(sep, cols, "y", rounds=3, lr=1.0 / 4)
        got = {r["id"]: r["score"]
               for r in logreg_score(sep, cols, w).collect()}
        for r in sep.collect():
            z = w[0] * r["x0"] + w[1] * r["x1"]
            want = 0.5 + 0.5 * z / (1 + abs(z))
            assert got[r["id"]] == want, (r["id"], got[r["id"]], want)

    def test_partition_invariant(self, spark, sep):
        from bloomy_etl_spark.operators.regression import logreg_gd_train

        cols = ["x0", "x1"]
        a = logreg_gd_train(sep.repartition(3), cols, "y", rounds=3)
        b = logreg_gd_train(sep.repartition(17), cols, "y", rounds=3)
        assert a == b

    def test_validation(self, spark, sep):
        from bloomy_etl_spark.operators.regression import (
            logreg_gd_train,
            logreg_score,
        )

        with pytest.raises(ValueError):
            logreg_gd_train(sep, ["x0"], "y", rounds=0)
        with pytest.raises(ValueError):
            logreg_gd_train(sep, [], "y")
        with pytest.raises(ValueError):
            logreg_score(sep, ["x0", "x1"], [0.1])
        with pytest.raises(ValueError):
            logreg_gd_train(sep.filter("id < 0"), ["x0"], "y")


class TestConversionFunnel:
    """Hand-checked semantics for q140's sorted-array funnel fold
    (the sf0.01 oracle gate runs in test_r5_operators)."""

    def _run(self, spark, rows):
        import datetime

        from bloomy_etl_spark.operators.engine_queries import (
            _FUNNEL_STAGES,
            funnel_stages,
        )

        base = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (i, base + datetime.timedelta(seconds=sec), uid, et)
                for i, (uid, sec, et) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        ev = df.select(
            "user_id", F.unix_micros("ts").alias("eus"),
            "event_id", "event_type",
        )
        return {
            r["user_id"]: r["stage"]
            for r in funnel_stages(ev, _FUNNEL_STAGES).collect()
        }

    def test_order_and_strictness(self, spark):
        got = self._run(spark, [
            # u1 completes the funnel in order
            (1, 0, "signup"), (1, 10, "view"), (1, 20, "click"),
            (1, 30, "purchase"),
            # u2: view BEFORE signup doesn't count; no later view → stage 1
            (2, 0, "view"), (2, 10, "signup"), (2, 20, "click"),
            # u3: view at the SAME second as signup — strict > rejects it
            (3, 5, "signup"), (3, 5, "view"),
            # u4: never signs up
            (4, 0, "view"), (4, 1, "click"), (4, 2, "purchase"),
            # u5: skips click → stuck at view
            (5, 0, "signup"), (5, 1, "view"), (5, 2, "purchase"),
        ])
        assert got == {1: 4, 2: 1, 3: 1, 4: 0, 5: 2}

    def test_repeated_events_advance_once(self, spark):
        got = self._run(spark, [
            (1, 0, "signup"), (1, 1, "signup"), (1, 2, "view"),
            (1, 3, "view"), (1, 4, "click"), (1, 5, "purchase"),
        ])
        assert got == {1: 4}


class TestTriangleCounts:
    """Hand-checked degree-ordered triangle counting
    (graph.triangle_counts; the sf0.01 oracle gate runs in
    test_r5_operators)."""

    def _tri(self, spark, edges):
        from bloomy_etl_spark.operators.graph import triangle_counts

        df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "x long, y long"
        ).distinct()
        return {
            r["node"]: r["n_triangles"]
            for r in triangle_counts(df).collect()
        }

    def test_k4_and_star(self, spark):
        # K4: C(4,3)=4 triangles, every node in exactly 3
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert self._tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
        # star: the skew shape the degree orientation exists for — no
        # triangles, and the hub's wedges are never materialized as hits
        star = [(0, i) for i in range(1, 8)]
        assert self._tri(spark, star) == {}

    def test_two_sharing_an_edge(self, spark):
        # triangles (0,1,2) and (1,2,3) share edge (1,2)
        got = self._tri(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
        assert got == {0: 1, 1: 2, 2: 2, 3: 1}

    def test_matches_brute_force_on_random_graph(self, spark):
        import itertools
        import random

        rng = random.Random(7)
        nodes = range(20)
        edges = {
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if rng.random() < 0.3
        }
        want: dict[int, int] = {}
        es = set(edges)
        for a, b, c in itertools.combinations(nodes, 3):
            if {(a, b), (a, c), (b, c)} <= es:
                for n in (a, b, c):
                    want[n] = want.get(n, 0) + 1
        assert self._tri(spark, edges) == want


class TestEwmaLast:
    """Hand-checked integer EWMA fold (timeseries.ewma_last; the
    sf0.01 oracle gate runs in test_r5_operators)."""

    def _run(self, spark, rows, alpha_den=4):
        from bloomy_etl_spark.operators.timeseries import ewma_last

        df = spark.createDataFrame(
            rows, "user_id long, eus long, event_id long, v long"
        )
        return {
            r["user_id"]: (r["n_obs"], r["last_v"], r["ewma"])
            for r in ewma_last(df, alpha_den=alpha_den).collect()
        }

    def test_recurrence_replay(self, spark):
        vals = [100, 0, 40, 200]
        rows = [(1, i, i, v) for i, v in enumerate(vals)]
        s = vals[0]
        for v in vals[1:]:
            s = (3 * s + v) // 4
        assert self._run(spark, rows) == {1: (4, 200, s)}

    def test_order_comes_from_timestamps_not_input(self, spark):
        rows = [(1, 30, 2, 8), (1, 10, 0, 100), (1, 20, 1, 0)]
        # time order: 100, 0, 8 → s = ((3·100+0)//4 → 75; (3·75+8)//4 → 58
        assert self._run(spark, rows) == {1: (3, 8, 58)}

    def test_single_observation_and_validation(self, spark):
        import pytest as _pt

        from bloomy_etl_spark.operators.timeseries import ewma_last

        assert self._run(spark, [(5, 0, 0, 42)]) == {5: (1, 42, 42)}
        with _pt.raises(ValueError):
            ewma_last(
                spark.createDataFrame(
                    [], "user_id long, eus long, event_id long, v long"
                ),
                alpha_den=1,
            )


class TestSkyline2d:
    """Hand-checked 2-D Pareto skyline (engine_queries.skyline_2d; the
    sf0.01 oracle gate runs in test_r5_operators)."""

    def _sky(self, spark, rows):
        from bloomy_etl_spark.operators.engine_queries import skyline_2d

        df = spark.createDataFrame(rows, "id long, x long, y long")
        return {r["id"] for r in skyline_2d(df, "x", "y").collect()}

    def test_dominance_and_duplicates(self, spark):
        rows = [
            (0, 10, 10),   # dominated by 1 (both strictly better)
            (1, 20, 20),   # skyline
            (2, 30, 5),    # skyline (best x among y<20)
            (3, 20, 20),   # duplicate of 1 → also skyline
            (4, 20, 15),   # same x as 1, lower y → dominated
            (5, 25, 20),   # dominates 1/3? x>20, y=20 → yes, skyline
            (6, 5, 50),    # skyline (best y)
        ]
        # 5 dominates 1 and 3 (x strictly greater, y equal)
        assert self._sky(spark, rows) == {2, 5, 6}

    def test_matches_brute_force(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, rng.randrange(20), rng.randrange(20))
                for i in range(200)]
        want = {
            i
            for i, x, y in rows
            if not any(
                qx >= x and qy >= y and (qx > x or qy > y)
                for _, qx, qy in rows
            )
        }
        assert self._sky(spark, rows) == want

    def test_single_row_and_monotone_chain(self, spark):
        assert self._sky(spark, [(7, 1, 1)]) == {7}
        # strictly anti-correlated chain: everything is skyline
        chain = [(i, i, 100 - i) for i in range(10)]
        assert self._sky(spark, chain) == set(range(10))


class TestLabelPropagation:
    """Synchronous LPA (graph.label_propagation): hand-traced rounds on
    a two-clique bridge graph, determinism of the min-label tie-break,
    and the zero-round identity."""

    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, ["x", "y"])

    def test_two_cliques_split_into_two_communities(self, spark):
        from bloomy_etl_spark.operators.graph import label_propagation

        pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12),
                 (3, 10)]
        got = {r["node"]: r["label"]
               for r in label_propagation(
                   self._edges(spark, pairs), rounds=3).collect()}
        comms = {}
        for n, lbl in got.items():
            comms.setdefault(lbl, set()).add(n)
        assert sorted(map(frozenset, comms.values()), key=min) == [
            frozenset({1, 2, 3}), frozenset({10, 11, 12})]

    def test_hand_traced_first_round_min_label_ties(self, spark):
        from bloomy_etl_spark.operators.graph import label_propagation

        # node 1's neighbors {2, 3} tie at count 1 → smallest label 2
        pairs = [(1, 2), (1, 3), (2, 3)]
        got = {r["node"]: r["label"]
               for r in label_propagation(
                   self._edges(spark, pairs), rounds=1).collect()}
        assert got == {1: 2, 2: 1, 3: 1}

    def test_zero_rounds_is_identity_and_negative_rejected(self, spark):
        import pytest

        from bloomy_etl_spark.operators.graph import label_propagation

        e = self._edges(spark, [(1, 2), (2, 3)])
        got = {r["node"]: r["label"]
               for r in label_propagation(e, rounds=0).collect()}
        assert got == {1: 1, 2: 2, 3: 3}
        with pytest.raises(ValueError):
            label_propagation(e, rounds=-1)

    def test_deterministic_across_partitioning(self, spark):
        from bloomy_etl_spark.operators.graph import label_propagation

        pairs = [(i, j) for i in range(12) for j in range(i + 1, 12)
                 if (i * 7 + j * 3) % 4 != 0]
        a = sorted(map(tuple, label_propagation(
            self._edges(spark, pairs).repartition(1), rounds=3).collect()))
        b = sorted(map(tuple, label_propagation(
            self._edges(spark, pairs).repartition(16), rounds=3).collect()))
        assert a == b
