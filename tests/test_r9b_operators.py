"""Round-9b operators: CUSUM change detection, Z-order layout +
zone maps, majority-vote label aggregation, SCD2 log compaction.

Each class hand-checks the operator's exact integer semantics on
fixtures small enough to verify by eye, plus the scale contracts
(plan shapes live in test_plans.py style pins at the bottom)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------
class TestCusumAlerts:
    def _run(self, spark, rows, drift, threshold):
        from bloomy_etl_spark.operators.timeseries import cusum_alerts

        df = spark.createDataFrame(
            rows, "user_id long, eus long, event_id long, v long"
        )
        return {
            r["user_id"]: (r["n_obs"], r["n_alerts"], r["resid"])
            for r in cusum_alerts(df, drift=drift,
                                  threshold=threshold).collect()
        }

    def test_hand_checked_walk(self, spark):
        # drift 10, threshold 12:
        #   u1: 5  -> max(0, 5-10)  = 0
        #       20 -> 0+20-10       = 10   (< 12)
        #       1  -> 10+1-10       = 1    -> 0 alerts, resid 1
        #   u2: 30 -> max(0, 30-10) = 20   (>= 12) -> alert, reset
        rows = [(1, 10, 1, 5), (1, 20, 2, 20), (1, 30, 3, 1),
                (2, 10, 1, 30)]
        out = self._run(spark, rows, drift=10, threshold=12)
        assert out[1] == (3, 0, 1)
        assert out[2] == (1, 1, 0)

    def test_every_step_alerts_and_resets(self, spark):
        rows = [(1, t, t, 25) for t in range(1, 4)]
        out = self._run(spark, rows, drift=10, threshold=12)
        assert out[1] == (3, 3, 0)

    def test_slow_accumulation_no_alert(self, spark):
        rows = [(1, t, t, 11) for t in range(1, 4)]
        out = self._run(spark, rows, drift=10, threshold=12)
        assert out[1] == (3, 0, 3)

    def test_negative_excursions_clamp_at_zero(self, spark):
        # a deep dip must not bank "credit" against the next burst
        rows = [(1, 1, 1, 0), (1, 2, 2, 0), (1, 3, 3, 21)]
        out = self._run(spark, rows, drift=10, threshold=12)
        # s: 0, 0 (clamped, not -20), then 0+21-10 = 11 < 12
        assert out[1] == (3, 0, 11)

    def test_input_row_order_irrelevant(self, spark):
        rows = [(1, t, t, v) for t, v in
                enumerate([3, 17, 0, 40, 2, 2, 29, 5], start=1)]
        a = self._run(spark, rows, drift=8, threshold=20)
        b = self._run(spark, list(reversed(rows)), drift=8, threshold=20)
        assert a == b

    def test_ties_break_on_order_col(self, spark):
        # same eus, different event_id: the (15 then 0) order alerts,
        # the packed fold must follow event_id ascending
        rows = [(1, 5, 2, 0), (1, 5, 1, 15)]
        out = self._run(spark, rows, drift=1, threshold=14)
        # order: v=15 (s=14 >= 14, alert+reset), then v=0 (s=0)
        assert out[1] == (2, 1, 0)

    def test_parameter_validation(self, spark):
        from bloomy_etl_spark.operators.timeseries import cusum_alerts

        df = spark.createDataFrame(
            [(1, 1, 1, 1)], "user_id long, eus long, event_id long, v long"
        )
        with pytest.raises(ValueError):
            cusum_alerts(df, drift=-1, threshold=10)
        with pytest.raises(ValueError):
            cusum_alerts(df, drift=1, threshold=0)
        with pytest.raises(ValueError):
            cusum_alerts(df, drift=1, threshold=10, enc=5)


# ---------------------------------------------------------------------------
# SCD2 compaction
# ---------------------------------------------------------------------------
class TestScd2Compact:
    def _run(self, spark, rows):
        from bloomy_etl_spark.operators.history import scd2_compact

        df = spark.createDataFrame(
            rows, "user_id long, eus long, event_id long, state string"
        )
        return sorted(
            (
                (r["user_id"], r["version"], r["state"], r["valid_from"],
                 r["valid_to"], r["n_rows"])
                for r in scd2_compact(df).collect()
            )
        )

    def test_runs_collapse_with_interval_chain(self, spark):
        rows = [(1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"),
                (1, 40, 4, "a")]
        assert self._run(spark, rows) == [
            (1, 1, "a", 10, 30, 2),
            (1, 2, "b", 30, 40, 1),
            (1, 3, "a", 40, None, 1),
        ]

    def test_single_run_is_open_ended(self, spark):
        rows = [(7, 5, 1, "x"), (7, 9, 2, "x")]
        assert self._run(spark, rows) == [(7, 1, "x", 5, None, 2)]

    def test_equal_timestamps_ordered_by_tiebreak(self, spark):
        # both at eus=10: event_id 1 is 'a', 2 is 'b' -> two runs
        rows = [(1, 10, 2, "b"), (1, 10, 1, "a")]
        assert self._run(spark, rows) == [
            (1, 1, "a", 10, 10, 1),
            (1, 2, "b", 10, None, 1),
        ]

    def test_audit_identities_on_fixture(self, spark):
        """Per user: n_rows sums to the log count, exactly one open
        run, intervals chain (valid_to == next valid_from)."""
        from bloomy_etl_spark.operators.history import scd2_compact

        ev = (
            spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select(
                "user_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("eus"),
                "event_id",
                F.col("event_type").alias("state"),
            )
        )
        hist = scd2_compact(ev).collect()
        log_counts = {
            r["user_id"]: r["n"]
            for r in ev.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        per_user: dict[int, list] = {}
        for r in hist:
            per_user.setdefault(r["user_id"], []).append(r)
        assert set(per_user) == set(log_counts)
        for uid, rs in per_user.items():
            rs.sort(key=lambda r: r["version"])
            assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
            assert sum(r["n_rows"] for r in rs) == log_counts[uid]
            assert [r for r in rs if r["valid_to"] is None] == [rs[-1]]
            for a, b in zip(rs, rs[1:]):
                assert a["valid_to"] == b["valid_from"]
                assert a["state"] != b["state"]


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------
def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for k in range(bits):
        z |= ((x >> k) & 1) << (2 * k + 1)
        z |= ((y >> k) & 1) << (2 * k)
    return z


class TestZorder:
    def test_zvalue_matches_python_interleave(self, spark):
        from bloomy_etl_spark.operators.zorder import zvalue

        pts = [(x, y) for x in (0, 1, 5, 127, 255) for y in
               (0, 2, 31, 200, 255)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select("x", "y",
                               zvalue(F.col("x"), F.col("y")).alias("z")
                               ).collect()
        }
        for (x, y), z in got.items():
            assert z == _py_morton(x, y), (x, y)

    def test_zvalue_locality_beats_linear_on_y(self, spark):
        # neighbors along y differ by 1 in z when y is even -- the
        # curve property that gives the second dimension locality at all
        assert _py_morton(3, 4) + 1 == _py_morton(3, 5)

    def test_file_assignment_equals_global_sort(self, spark):
        from bloomy_etl_spark.operators.zorder import zorder_files

        rows = [(i, (i * 37) % 256, (i * 101) % 256)
                for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, xb long, yb long")
        out = zorder_files(df, "xb", "yb", "id",
                           rows_per_file=64).collect()
        expect = sorted(
            ((_py_morton(x, y), i) for i, x, y in rows)
        )
        rank_of = {i: r for r, (_, i) in enumerate(expect)}
        for r in out:
            assert r["z"] == _py_morton(r["xb"], r["yb"])
            assert r["file_id"] == rank_of[r["id"]] // 64, r

    def test_zone_maps_partition_the_rank_space(self, spark):
        from bloomy_etl_spark.operators.zorder import (
            zone_maps,
            zorder_files,
        )

        rows = [(i, (i * 7) % 64, (i * 13) % 64) for i in range(512)]
        df = spark.createDataFrame(rows, "id long, xb long, yb long")
        zm = sorted(
            zone_maps(
                zorder_files(df, "xb", "yb", "id", rows_per_file=100),
                "xb", "yb",
            ).collect(),
            key=lambda r: r["file_id"],
        )
        assert [r["file_id"] for r in zm] == list(range(len(zm)))
        assert sum(r["n_rows"] for r in zm) == 512
        assert all(r["n_rows"] == 100 for r in zm[:-1])
        for a, b in zip(zm, zm[1:]):
            assert a["z_max"] <= b["z_min"]

    def test_zone_maps_actually_prune_a_rectangle(self, spark):
        """On a uniform 64x64 grid with 256-row files, the 16x16 query
        rectangle must skip most files — the point of the layout."""
        from bloomy_etl_spark.operators.zorder import (
            zone_maps,
            zorder_files,
        )

        rows = [(64 * x + y, x, y) for x in range(64) for y in range(64)]
        df = spark.createDataFrame(rows, "id long, xb long, yb long")
        zm = zone_maps(
            zorder_files(df, "xb", "yb", "id", rows_per_file=256),
            "xb", "yb",
        ).collect()
        scanned = [
            r for r in zm
            if r["x_min"] <= 23 and r["x_max"] >= 8
            and r["y_min"] <= 23 and r["y_max"] >= 8
        ]
        assert len(zm) == 16
        # perfect z layout of a power-of-two grid boxes each file into
        # a 16x16 tile: the 16x16 off-grid query rectangle overlaps at
        # most 4 tiles; any row-major layout would scan all 16
        assert len(scanned) <= 4

    def test_rows_per_file_validation(self, spark):
        from bloomy_etl_spark.operators.zorder import zorder_files, zvalue

        df = spark.createDataFrame([(1, 1, 1)], "id long, xb long, yb long")
        with pytest.raises(ValueError):
            zorder_files(df, "xb", "yb", "id", rows_per_file=0)
        with pytest.raises(ValueError):
            zvalue(F.col("xb"), F.col("yb"), bits=0)


# ---------------------------------------------------------------------------
# Majority vote
# ---------------------------------------------------------------------------
class TestMajorityVote:
    def _run(self, spark, rows, min_share_e6=0):
        from bloomy_etl_spark.operators.labels import majority_vote

        df = spark.createDataFrame(rows, "item long, label string")
        return {
            r["item"]: (r["label"], r["n_votes"], r["n_wins"],
                        r["share_e6"], r["decided"])
            for r in majority_vote(df,
                                   min_share_e6=min_share_e6).collect()
        }

    def test_majority_and_share(self, spark):
        rows = [(1, "a"), (1, "a"), (1, "b"),
                (2, "x")]
        out = self._run(spark, rows, min_share_e6=500_000)
        assert out[1] == ("a", 3, 2, 666_666, True)
        assert out[2] == ("x", 1, 1, 1_000_000, True)

    def test_tie_breaks_to_smallest_label(self, spark):
        rows = [(1, "b"), (1, "a")]
        out = self._run(spark, rows)
        assert out[1][0] == "a"
        assert out[1][3] == 500_000

    def test_abstain_below_threshold(self, spark):
        rows = [(1, "a"), (1, "b"), (1, "c")]
        out = self._run(spark, rows, min_share_e6=400_000)
        label, n_votes, n_wins, share, decided = out[1]
        assert (n_votes, n_wins, share) == (3, 1, 333_333)
        assert decided is False

    def test_one_row_per_item_always(self, spark):
        rows = [(i, l) for i in range(20)
                for l in ["a", "b", "b", "c"][: (i % 4) + 1]]
        out = self._run(spark, rows)
        assert len(out) == 20


# ---------------------------------------------------------------------------
# Plan pins
# ---------------------------------------------------------------------------
def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def test_cusum_query_plan_is_one_fold_shuffle(spark):
    """q149: the q142 shape — one user-keyed exchange plus the
    presentation sort; no joins, no windows."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q149_cusum_changepoints"](spark, SF_SMOKE))
    assert "Join" not in p
    assert p.count(") Exchange") <= 2


def test_scd2_query_plan_reuses_one_partitioning(spark):
    """q152: lag + running sum + run aggregate + lead all ride ONE
    user-keyed exchange (plus the presentation sort)."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q152_state_run_history"](spark, SF_SMOKE))
    assert "Join" not in p
    assert p.count(") Exchange") <= 2


def test_zorder_query_plan_has_no_global_window(spark):
    """q150: the corpus-grain rank must come from the two-phase scan —
    a bucket-PARTITIONED window plus a broadcast of the 256-row offset
    frame; the only unpartitioned window may be over bucket totals.
    No cartesian, no sort-merge join of corpus-grain sides."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q150_zorder_zonemaps"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    # AQE's formatted string can render the join in both the initial
    # and final plan — require presence, forbid shuffled alternatives
    assert p.count("BroadcastHashJoin") >= 1
    assert "ShuffledHashJoin" not in p


def test_vote_query_plan_windows_are_item_partitioned(spark):
    """q151: the consensus windows run on the (item,label) count frame,
    partitioned by item — never an unpartitioned corpus window."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q151_vote_consensus"](spark, SF_SMOKE))
    assert "Join" not in p
    # window partition spec present on every Window node
    import re

    for m in re.finditer(r"\(\d+\) Window\n(?:[^\n]*\n){0,4}", p):
        block = m.group(0)
        assert "item" in block, block


# ---------------------------------------------------------------------------
# Bradley-Terry
# ---------------------------------------------------------------------------
class TestBradleyTerry:
    def _fit(self, spark, duels, rounds=3):
        from bloomy_etl_spark.operators.preference import bradley_terry

        df = spark.createDataFrame(duels, "winner string, loser string")
        return {
            r["item"]: (r["n_wins"], r["n_games"], r["strength_e6"])
            for r in bradley_terry(df, rounds=rounds).collect()
        }

    def test_two_item_analytic_fixed_point(self, spark):
        # A beats B twice, B beats A once: the MLE ratio is 2:1, and at
        # mean strength 1e6 the integer MM lands on 1333333 / 666666
        # after one round and stays there (hand-walked)
        duels = [("A", "B"), ("A", "B"), ("B", "A")]
        out = self._fit(spark, duels)
        assert out["A"] == (2, 3, 1_333_333)
        assert out["B"] == (1, 3, 666_666)

    def test_winless_item_floors_at_one(self, spark):
        duels = [("A", "B")] * 3
        out = self._fit(spark, duels)
        assert out["B"][0] == 0 and out["B"][2] == 1
        assert out["A"][2] >= 1_900_000

    def test_chain_orders_strengths(self, spark):
        # A > B > C with clean sweeps: strengths strictly ordered
        duels = ([("A", "B")] * 4 + [("B", "C")] * 4 + [("A", "C")] * 4)
        out = self._fit(spark, duels)
        assert out["A"][2] > out["B"][2] > out["C"][2]

    def test_duplicate_log_is_strength_invariant(self, spark):
        # doubling every duel doubles W and g: the MM update is
        # scale-invariant in the counts, so strengths must not move
        duels = [("A", "B"), ("A", "B"), ("B", "C"), ("C", "A"),
                 ("B", "A"), ("A", "C")]
        one = self._fit(spark, duels)
        two = self._fit(spark, duels * 2)
        for item in one:
            assert one[item][2] == two[item][2]
            assert two[item][0] == 2 * one[item][0]

    def test_rounds_validation(self, spark):
        from bloomy_etl_spark.operators.preference import bradley_terry

        df = spark.createDataFrame([("A", "B")], "winner string, loser string")
        with pytest.raises(ValueError):
            bradley_terry(df, rounds=0)


def test_bradley_terry_query_plan_no_cartesian(spark):
    """q154: the duel self-join is equi on the order key; rounds join
    item-grain tables — no cartesian or nested-loop anywhere."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q154_bradley_terry"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------
class TestKCore:
    def _run(self, spark, edges, k, rounds=8):
        from bloomy_etl_spark.operators.graph import k_core

        df = spark.createDataFrame(edges, "x long, y long")
        rows = k_core(df, k=k, rounds=rounds).collect()
        return (
            {r["node"]: r["degree"] for r in rows},
            all(r["converged"] for r in rows) if rows else None,
        )

    def test_pendant_peels_triangle_survives(self, spark):
        deg, conv = self._run(spark, [(1, 2), (2, 3), (1, 3), (1, 4)], k=2)
        assert deg == {1: 2, 2: 2, 3: 2}
        assert conv is True

    def test_path_cascades_to_empty(self, spark):
        # every peel re-exposes a new endpoint: the 2-core of a path is
        # empty, which only a CASCADING peel finds
        deg, conv = self._run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=2)
        assert deg == {}

    def test_unconverged_peel_is_flagged(self, spark):
        deg, conv = self._run(
            spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=2, rounds=1
        )
        # one round removes only the original endpoints; the surviving
        # path 2-3-4 still has degree-1 nodes -> not the 2-core yet
        assert deg and conv is False

    def test_validation(self, spark):
        from bloomy_etl_spark.operators.graph import k_core

        df = spark.createDataFrame([(1, 2)], "x long, y long")
        with pytest.raises(ValueError):
            k_core(df, k=0)
        with pytest.raises(ValueError):
            k_core(df, k=1, rounds=0)


def test_kcore_query_plan_no_cartesian(spark):
    """q155: every peel round is a node-keyed agg + two semi joins;
    nothing nested-loop, nothing cartesian, at any round."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q155_supplier_kcore"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# Judged retrieval metrics
# ---------------------------------------------------------------------------
class TestJudgedRetrievalMetrics:
    def _run(self, spark, rows, k):
        from bloomy_etl_spark.operators.evals import judged_retrieval_metrics

        df = spark.createDataFrame(
            rows, "query_id long, rank long, rel long, n_relevant long"
        )
        return {
            r["query_id"]: r.asDict()
            for r in judged_retrieval_metrics(df, k=k).collect()
        }

    def test_hand_checked_against_shared_weight_table(self, spark):
        from bloomy_etl_spark.operators.evals import (
            dcg_weights_e9,
            idcg_prefix_e9,
        )

        w, p = dcg_weights_e9(3), idcg_prefix_e9(3)
        rows = [
            (1, 1, 1, 5), (1, 2, 0, 5), (1, 3, 1, 5),   # hits at 1, 3
            (2, 1, 0, 4), (2, 2, 1, 4), (2, 3, 0, 4),   # first hit at 2
            (3, 1, 0, 7), (3, 2, 0, 7), (3, 3, 0, 7),   # no hits
        ]
        out = self._run(spark, rows, k=3)
        dcg1 = w[0] + w[2]
        assert out[1]["hits"] == 2 and out[1]["dcg_e9"] == dcg1
        assert out[1]["idcg_e9"] == p[2]                  # min(5, 3) = 3
        assert out[1]["ndcg_e6"] == dcg1 * 1_000_000 // p[2]
        assert out[1]["mrr_e6"] == 1_000_000
        assert out[1]["recall_e6"] == 2 * 1_000_000 // 5
        assert out[2]["mrr_e6"] == 500_000
        assert out[2]["ndcg_e6"] == w[1] * 1_000_000 // p[2]  # min(4,3)=3
        assert out[3] == {
            "query_id": 3, "n_relevant": 7, "hits": 0, "dcg_e9": 0,
            "idcg_e9": p[2], "ndcg_e6": 0, "mrr_e6": 0, "recall_e6": 0,
        }

    def test_zero_relevant_query_is_all_zero(self, spark):
        out = self._run(spark, [(9, 1, 0, 0), (9, 2, 0, 0)], k=2)
        assert out[9] == {
            "query_id": 9, "n_relevant": 0, "hits": 0, "dcg_e9": 0,
            "idcg_e9": 0, "ndcg_e6": 0, "mrr_e6": 0, "recall_e6": 0,
        }

    def test_perfect_ranking_scores_unity(self, spark):
        rows = [(5, r, 1, 2) for r in (1, 2)]
        out = self._run(spark, rows, k=2)
        assert out[5]["ndcg_e6"] == 1_000_000
        assert out[5]["recall_e6"] == 1_000_000
        assert out[5]["mrr_e6"] == 1_000_000

    def test_rows_beyond_k_ignored(self, spark):
        rows = [(1, 1, 0, 3), (1, 2, 1, 3), (1, 7, 1, 3)]
        out = self._run(spark, rows, k=2)
        assert out[1]["hits"] == 1

    def test_k_validation(self, spark):
        from bloomy_etl_spark.operators.evals import judged_retrieval_metrics

        df = spark.createDataFrame(
            [(1, 1, 1, 1)], "query_id long, rank long, rel long, n_relevant long"
        )
        with pytest.raises(ValueError):
            judged_retrieval_metrics(df, k=0)


# ---------------------------------------------------------------------------
# MERGE INTO
# ---------------------------------------------------------------------------
class TestMergeInto:
    def _merge(self, spark, target, source, **kw):
        from bloomy_etl_spark.operators.upsert import merge_into

        t = spark.createDataFrame(target, "k long, v long, tag string")
        s = spark.createDataFrame(source, "k long, d long")
        out = merge_into(t, s, ["k"], **kw)
        return sorted(tuple(r) for r in out.collect())

    def test_three_clause_semantics(self, spark):
        got = self._merge(
            spark,
            target=[(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
            source=[(1, 5), (3, -99), (4, 40)],
            update_set={"v": F.col("t.v") + F.col("s.d")},
            delete_where=F.col("s.d") < 0,
            insert_values={"v": F.col("s.d"), "tag": F.lit("new")},
        )
        # 1 updated, 2 untouched, 3 deleted, 4 inserted
        assert got == [(1, 15, "a"), (2, 20, "b"), (4, 40, "new")]

    def test_delete_wins_over_update(self, spark):
        got = self._merge(
            spark,
            target=[(1, 10, "a")],
            source=[(1, -1)],
            update_set={"v": F.lit(999)},
            delete_where=F.col("s.d") < 0,
            insert_values={"v": F.col("s.d"), "tag": F.lit("new")},
        )
        assert got == []

    def test_no_insert_clause_ignores_unmatched_source(self, spark):
        got = self._merge(
            spark,
            target=[(1, 10, "a")],
            source=[(1, 5), (9, 90)],
            update_set={"v": F.col("t.v") + F.col("s.d")},
        )
        assert got == [(1, 15, "a")]

    def test_update_only_mentioned_columns(self, spark):
        got = self._merge(
            spark,
            target=[(1, 10, "keepme")],
            source=[(1, 7)],
            update_set={"v": F.col("s.d")},
        )
        assert got == [(1, 7, "keepme")]

    def test_missing_insert_column_raises(self, spark):
        with pytest.raises(ValueError, match="insert_values missing"):
            self._merge(
                spark,
                target=[(1, 10, "a")],
                source=[(2, 5)],
                insert_values={"v": F.col("s.d")},  # no 'tag'
            )

    def test_cardinality_violation_raises(self, spark):
        with pytest.raises(ValueError, match="cardinality"):
            self._merge(
                spark,
                target=[(1, 10, "a")],
                source=[(1, 5), (1, 6)],
                update_set={"v": F.col("s.d")},
                check_unique=True,
            )


def test_merge_query_plan_is_one_fullouter_join(spark):
    """q159: two aggs + ONE full-outer SortMergeJoin on the key; the
    clauses are codegen projections — no second join, no window."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q159_merge_upsert"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


# ---------------------------------------------------------------------------
# Time-weighted average
# ---------------------------------------------------------------------------
class TestTimeWeightedAvg:
    def _run(self, spark, rows):
        from bloomy_etl_spark.operators.timeseries import time_weighted_avg

        df = spark.createDataFrame(
            rows, "user_id long, eus long, event_id long, v long"
        )
        return {
            r["user_id"]: (r["n_obs"], r["span_us"], r["twa"])
            for r in time_weighted_avg(df).collect()
        }

    def test_uneven_sampling_weights_by_held_time(self, spark):
        # v=100 held for 9 ms, v=0 held for 1 ms, final obs holds 0:
        # TWA = (100*9 + 0*1) / 10 = 90 — a plain AVG says 40
        rows = [(1, 0, 1, 100), (1, 9_000, 2, 0), (1, 10_000, 3, 20)]
        out = self._run(spark, rows)
        assert out[1] == (3, 10_000, 90)

    def test_single_observation_falls_back_to_value(self, spark):
        out = self._run(spark, [(2, 5, 1, 42)])
        assert out[2] == (1, 0, 42)

    def test_sub_ms_gaps_fall_back_to_last(self, spark):
        # all gaps under 1 ms quantize to zero width -> LOCF limit is
        # the last value in (eus, event_id) order
        rows = [(3, 0, 1, 7), (3, 500, 2, 9), (3, 900, 3, 11)]
        out = self._run(spark, rows)
        assert out[3] == (3, 900, 11)

    def test_constant_series_is_exact(self, spark):
        rows = [(4, t * 1000, t, 1234) for t in range(10)]
        out = self._run(spark, rows)
        assert out[4][2] == 1234

    def test_tie_rows_carry_zero_width(self, spark):
        # two obs at the same instant: the earlier (by event_id) has
        # zero width, so only the later one is ever "held"
        rows = [(5, 0, 1, 999), (5, 0, 2, 10), (5, 2000, 3, 10)]
        out = self._run(spark, rows)
        assert out[5] == (3, 2000, 10)


# ---------------------------------------------------------------------------
# Weighted SSSP
# ---------------------------------------------------------------------------
class TestWeightedSssp:
    def _run(self, spark, edges, sources, rounds):
        from bloomy_etl_spark.operators.graph import weighted_sssp

        sym = edges + [(d, s, w) for s, d, w in edges]
        e = spark.createDataFrame(sym, "src long, dst long, w long")
        src = spark.createDataFrame([(s,) for s in sources], "node long")
        return {
            r["node"]: r["dist"]
            for r in weighted_sssp(e, src, rounds=rounds).collect()
        }

    def test_two_hop_beats_direct_edge(self, spark):
        edges = [(1, 2, 5), (2, 3, 5), (1, 3, 20)]
        assert self._run(spark, edges, [1], rounds=2) == {1: 0, 2: 5, 3: 10}

    def test_one_round_sees_only_direct(self, spark):
        edges = [(1, 2, 5), (2, 3, 5), (1, 3, 20)]
        assert self._run(spark, edges, [1], rounds=1) == {1: 0, 2: 5, 3: 20}

    def test_unreached_nodes_absent(self, spark):
        edges = [(1, 2, 1), (8, 9, 1)]
        out = self._run(spark, edges, [1], rounds=3)
        assert out == {1: 0, 2: 1}

    def test_multi_source_takes_min(self, spark):
        edges = [(1, 2, 10), (3, 2, 1)]
        assert self._run(spark, edges, [1, 3], rounds=1)[2] == 1

    def test_zero_rounds_is_sources_only(self, spark):
        edges = [(1, 2, 1)]
        assert self._run(spark, edges, [1], rounds=0) == {1: 0}


# ---------------------------------------------------------------------------
# Touch attribution (query-level unit; the oracle gates it end-to-end)
# ---------------------------------------------------------------------------
def test_attribution_hand_case(spark, tmp_path):
    import datetime

    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    t0 = datetime.datetime(2024, 1, 1)

    def ts(days, secs=0):
        return t0 + datetime.timedelta(days=days, seconds=secs)

    rows = [
        # user 1: view then (same instant) click -> purchase credits click
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(0), 1, "click", 1.0, "{}"),
        (3, ts(1), 1, "purchase", 1.0, "{}"),
        # user 2: view, purchase inside 7d, second purchase outside
        (4, ts(0), 2, "view", 1.0, "{}"),
        (5, ts(3), 2, "purchase", 1.0, "{}"),
        (6, ts(20), 2, "purchase", 1.0, "{}"),
        # user 3: purchase with no touch at all
        (7, ts(0), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")  # q162 reads events only
    out = {
        r["purchase_id"]: (r["channel"], r["lag_us"])
        for r in ENGINE_QUERIES["q162_touch_attribution"](
            spark, sf
        ).collect()
    }
    day_us = 86_400_000_000
    assert out[3] == ("click", day_us)
    assert out[5] == ("view", 3 * day_us)
    assert out[6] == ("direct", None)
    assert out[7] == ("direct", None)


def test_concurrency_query_plan_has_no_global_window(spark):
    """q167: the sweep's running balance must come from the day-
    partitioned window + the bounded day-grain offset frame — the only
    unpartitioned window may be over day totals, and the offsets reach
    the corpus through a broadcast join."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q167_peak_concurrency"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 1


def test_sketch_accuracy_in_estimation_regime(spark):
    """q166 must actually exercise ESTIMATION (k=64 < distinct users):
    at least one group's estimate differs from exact — otherwise the
    audit silently collapses to the exact regime and proves nothing."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    from tests.conftest import SF_ORACLE

    rows = ENGINE_QUERIES["q166_sketch_accuracy"](
        spark, SF_ORACLE
    ).collect()
    assert rows
    assert any(r["n_est"] != r["n_exact"] for r in rows)
    # and the estimator should still be in the right ballpark
    for r in rows:
        assert r["err_e6"] < 500_000, r  # < 50% relative error


def test_percentile_grid_nearest_rank_hand_case(spark, tmp_path):
    """Nearest-rank on a 1..10 value list: P10 = 1st value, P50 = 5th,
    P90 = 9th — and every grid cell is a value that actually occurs."""
    import datetime

    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "view", i / 10000, "{}") for i in range(1, 11)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = ENGINE_QUERIES["q169_percentile_grid"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["p10_e4"], r["p50_e4"], r["p90_e4"]) == (10, 1, 5, 9)


def test_rolling_actives_window_identity(spark):
    """WAU(day) must equal the union of DAU sets over the trailing 7
    days — checked directly on the fixture."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    out = {
        r["day"]: (r["dau"], r["wau"])
        for r in ENGINE_QUERIES["q168_rolling_actives"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
            .alias("day"),
            "user_id",
        )
        .distinct()
        .collect()
    )
    by_day: dict[int, set] = {}
    for r in ev:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    for day, (dau, wau) in out.items():
        assert dau == len(by_day.get(day, set()))
        expect = set()
        for d in range(day - 6, day + 1):
            expect |= by_day.get(d, set())
        assert wau == len(expect), day


def test_subquery_pack_decorrelates_to_joins(spark):
    """q170: Catalyst must decorrelate the scalar subqueries and
    EXISTS/NOT EXISTS into aggregate/semi/anti joins — a
    BroadcastNestedLoopJoin or CartesianProduct in the plan means a
    per-row subquery re-execution, which dies at scale."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    p = _plan(ENGINE_QUERIES["q170_subquery_pack"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Semi" in p or "Anti" in p  # the EXISTS family became joins


# ---------------------------------------------------------------------------
# basket_pairs (r9 optimization: in-row pair expansion replaces the
# distinct() ⋈ distinct() self-join in the co-occurrence edge builds of
# q82/q141/q145/q155/q163)
# ---------------------------------------------------------------------------
class TestBasketPairs:
    def _self_join_reference(self, df):
        """The formulation basket_pairs replaced, verbatim."""
        op = df.select(F.col("o"), F.col("i")).distinct()
        return (
            op.select("o", F.col("i").alias("x"))
            .join(op.select("o", F.col("i").alias("y")), "o")
            .filter(F.col("x") < F.col("y"))
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("w"))
        )

    def test_equivalent_to_self_join(self, spark):
        from bloomy_etl_spark.operators.graph import basket_pairs

        # duplicates inside a basket (1,10 twice), singleton basket (4),
        # overlapping baskets, unsorted arrival order
        rows = [(1, 10), (1, 30), (1, 20), (1, 10),
                (2, 20), (2, 10),
                (3, 30), (3, 10), (3, 20),
                (4, 99)]
        df = spark.createDataFrame(rows, "o long, i long")
        got = {(r["x"], r["y"]): r["w"]
               for r in basket_pairs(df, key="o", item="i").collect()}
        ref = {(r["x"], r["y"]): r["w"]
               for r in self._self_join_reference(df).collect()}
        # hand check: (10,20) in baskets 1,2,3; (10,30) in 1,3; (20,30)
        # in 1,3; singleton basket 4 contributes nothing; the in-basket
        # duplicate (1,10) is collapsed by the set grain
        assert ref == {(10, 20): 3, (10, 30): 2, (20, 30): 2}
        assert got == ref

    def test_weight_alias(self, spark):
        from bloomy_etl_spark.operators.graph import basket_pairs

        df = spark.createDataFrame([(1, 5), (1, 6)], "o long, i long")
        out = basket_pairs(df, key="o", item="i", weight="n")
        assert out.columns == ["x", "y", "n"]
        assert out.collect()[0]["n"] == 1

    def test_plan_has_no_join(self, spark):
        """The whole point: two exchanges (basket agg, pair agg), zero
        joins — the key-grain table is never shuffled twice."""
        from bloomy_etl_spark.operators.graph import basket_pairs

        df = spark.createDataFrame([(1, 5), (1, 6)], "o long, i long")
        import re

        p = _plan(basket_pairs(df, key="o", item="i"))
        assert "Join" not in p
        # formatted explain lists each operator twice (tree + detail);
        # count the numbered detail entries only
        assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) <= 2, p

    def test_max_basket_guard_fails_loudly(self, spark):
        """r10 hot-key guard (VERDICT r09 item 7): a basket exceeding
        ``max_basket`` must FAIL THE JOB with a diagnostic, not expand
        C(basket,2) rows toward a single-row OOM."""
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        from bloomy_etl_spark.operators.graph import basket_pairs

        # key 1 is the pathological basket (5 items > cap 3)
        rows = [(1, i) for i in range(5)] + [(2, 10), (2, 11)]
        df = spark.createDataFrame(rows, "o long, i long")
        with pytest.raises((PySparkException, Py4JJavaError)) as exc:
            basket_pairs(df, key="o", item="i", max_basket=3).collect()
        assert "max_basket=3" in str(exc.value)

    def test_max_basket_within_bound_identical(self, spark):
        """A cap no basket reaches changes nothing: same pair multiset
        as the unguarded path."""
        from bloomy_etl_spark.operators.graph import basket_pairs

        rows = [(1, 10), (1, 30), (1, 20), (2, 20), (2, 10)]
        df = spark.createDataFrame(rows, "o long, i long")
        unguarded = {(r["x"], r["y"]): r["w"]
                     for r in basket_pairs(df, key="o", item="i").collect()}
        guarded = {(r["x"], r["y"]): r["w"]
                   for r in basket_pairs(df, key="o", item="i",
                                         max_basket=7).collect()}
        assert guarded == unguarded

    def test_default_plan_unchanged_by_guard_param(self, spark):
        """``max_basket=None`` (every current call site) must add no
        plan node — callers' r9 plan pins stay byte-valid."""
        from bloomy_etl_spark.operators.graph import basket_pairs

        df = spark.createDataFrame([(1, 5), (1, 6)], "o long, i long")
        p_default = _plan(basket_pairs(df, key="o", item="i"))
        assert "raise_error" not in p_default
        # assert_true renders as a raise_error(USER_RAISED_EXCEPTION, ...)
        # guard expression in the physical plan
        p_guarded = _plan(basket_pairs(df, key="o", item="i", max_basket=3))
        assert "raise_error" in p_guarded


# ---------------------------------------------------------------------------
# cosine_topk pass-through columns (r9: q157's in-row label ride-along)
# ---------------------------------------------------------------------------
class TestCosineTopkKeepCols:
    def test_keep_cols_match_join_back(self, spark):
        """q_keep/c_keep must reproduce exactly what joining the side
        tables back onto the ranked output produced (the pre-r9 shape),
        for every ranked row."""
        from bloomy_etl_spark.operators.similarity import cosine_topk

        rows = [
            (1, [1.0, 0.0, 0.0], "a"),
            (2, [0.9, 0.1, 0.0], "b"),
            (3, [0.0, 1.0, 0.0], "a"),
            (4, [0.1, 0.9, 0.1], "b"),
            (5, [0.5, 0.5, 0.0], "a"),
        ]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string"
        )
        queries = embs.filter(F.col("vec_id").isin(1, 3))

        base = cosine_topk(embs, queries, k=2)
        joined = {
            (r["query_id"], r["neighbor_id"]): (r["ql"], r["nl"], r["rank"])
            for r in base.join(
                queries.select(F.col("vec_id").alias("query_id"),
                               F.col("label").alias("ql")), "query_id")
            .join(embs.select(F.col("vec_id").alias("neighbor_id"),
                              F.col("label").alias("nl")), "neighbor_id")
            .collect()
        }
        kept = {
            (r["query_id"], r["neighbor_id"]): (r["ql"], r["nl"], r["rank"])
            for r in cosine_topk(
                embs.select("vec_id", "embedding",
                            F.col("label").alias("nl")),
                queries.select("vec_id", "embedding",
                               F.col("label").alias("ql")),
                k=2, q_keep=("ql",), c_keep=("nl",),
            ).collect()
        }
        assert kept == joined

    def test_default_signature_unchanged(self, spark):
        """No keep columns -> exactly the pre-r9 output schema."""
        from bloomy_etl_spark.operators.similarity import cosine_topk

        embs = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        out = cosine_topk(embs, embs.filter(F.col("vec_id") == 1), k=2)
        assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]
