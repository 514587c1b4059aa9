"""Mergeable equi-width histogram sketch (bounded-state quantiles):
merge ≡ one-shot exactly (integer counts), quantile value error bounded
by one bin width, exact tail clamps, and the shuffle-bound plan shape.
(The CMS / HLL / KMV sketch families are covered by t2:q65/q79 and
tests/test_r5_operators.py.)
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.sketches import (
    hist_build,
    hist_merge,
    hist_quantile,
)


@pytest.fixture(scope="module")
def values_df(spark):
    rng = random.Random(421)
    rows = [
        (i, ["a", "b", "c"][i % 3], rng.uniform(0.0, 1000.0))
        for i in range(3000)
    ]
    # nulls must be skipped, tails must clamp exactly
    rows += [(90001, "a", None), (90002, "a", -57.5), (90003, "b", 2345.0)]
    return spark.createDataFrame(rows, "id long, g string, v double")


class TestHistBuild:
    def test_counts_conserved_and_tails_exact(self, values_df):
        sk = hist_build(values_df, ["g"], "v", lo=0.0, hi=1000.0, n_bins=100)
        got = {r["g"]: r.asDict() for r in sk.collect()}
        assert set(got) == {"a", "b", "c"}
        for g, r in got.items():
            assert sum(r["hist"]) + r["n_under"] + r["n_over"] == r["n"]
        assert got["a"]["n_under"] == 1 and got["a"]["vmin"] == -57.5
        assert got["b"]["n_over"] == 1 and got["b"]["vmax"] == 2345.0
        assert got["c"]["n_under"] == 0 and got["c"]["n_over"] == 0
        # null row contributed nothing
        assert got["a"]["n"] == 1001

    def test_validation(self, values_df):
        with pytest.raises(ValueError, match="hi > lo"):
            hist_build(values_df, ["g"], "v", lo=5.0, hi=5.0)
        with pytest.raises(ValueError, match="n_bins"):
            hist_build(values_df, ["g"], "v", lo=0.0, hi=1.0, n_bins=0)

    def test_shuffle_bounded_by_sketch_size(self, values_df):
        """The per-key assembly aggregates ≤ n_bins+2 rows per group —
        the first-level (keys, bin) aggregate with map-side combine is
        what touches the data. Both levels are plain hash aggregates;
        no window, no collect to the driver."""
        sk = hist_build(values_df, ["g"], "v", lo=0.0, hi=1000.0, n_bins=10)
        plan = sk._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert plan.count("Exchange") <= 2


class TestHistMerge:
    def test_merge_equals_oneshot_exactly(self, values_df):
        full = hist_build(values_df, ["g"], "v", 0.0, 1000.0, n_bins=64)
        slices = [
            hist_build(values_df.filter(F.col("id") % 3 == k), ["g"], "v",
                       0.0, 1000.0, n_bins=64)
            for k in range(3)
        ]
        merged = hist_merge(*slices)
        a = {r["g"]: r.asDict() for r in full.collect()}
        b = {r["g"]: r.asDict() for r in merged.collect()}
        assert a == b  # integer state: merge is EXACT, not approximate

    def test_mismatched_bins_fail_loudly(self, spark, values_df):
        s1 = hist_build(values_df, ["g"], "v", 0.0, 1000.0, n_bins=32)
        s2 = hist_build(values_df, ["g"], "v", 0.0, 1000.0, n_bins=64)
        with pytest.raises(Exception, match="mismatched n_bins"):
            hist_merge(s1, s2).collect()

    def test_empty_args_rejected(self):
        with pytest.raises(ValueError, match="no sketches"):
            hist_merge()


class TestHistQuantile:
    def test_value_error_bounded_by_bin_width(self, spark):
        rng = random.Random(7)
        vals = [rng.uniform(0.0, 1000.0) for _ in range(5000)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        n_bins = 100
        width = 1000.0 / n_bins
        sk = hist_build(df, [], "v", 0.0, 1000.0, n_bins=n_bins)
        qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        got = {r["q"]: r["est"] for r in hist_quantile(sk, qs, 0.0, 1000.0).collect()}
        svals = sorted(vals)
        for q in qs:
            # true q-quantile under the same rank convention: first value
            # whose cumulative count reaches q*n
            import math

            rank = max(1, math.ceil(q * len(svals)))
            truth = svals[rank - 1]
            assert abs(got[q] - truth) <= width + 1e-9, (q, got[q], truth)

    def test_tail_ranks_clamp_to_exact_min_max(self, spark):
        # 5 values below lo, 5 above hi, nothing in range
        rows = [(-float(i),) for i in range(1, 6)] + [(1000.0 + i,) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "v double")
        sk = hist_build(df, [], "v", 0.0, 1000.0, n_bins=10)
        got = {r["q"]: r["est"] for r in
               hist_quantile(sk, [0.0, 0.3, 0.5, 0.9, 1.0], 0.0, 1000.0).collect()}
        assert got[0.0] == -5.0 and got[0.3] == -5.0 and got[0.5] == -5.0
        assert got[0.9] == 1005.0 and got[1.0] == 1005.0

    def test_quantiles_on_merged_sketch_match_oneshot(self, spark, values_df):
        full = hist_build(values_df, ["g"], "v", 0.0, 1000.0, n_bins=50)
        merged = hist_merge(*[
            hist_build(values_df.filter(F.col("id") % 2 == k), ["g"], "v",
                       0.0, 1000.0, n_bins=50)
            for k in range(2)
        ])
        qa = sorted(map(tuple, hist_quantile(full, [0.5], 0.0, 1000.0).collect()))
        qb = sorted(map(tuple, hist_quantile(merged, [0.5], 0.0, 1000.0).collect()))
        assert qa == qb

    def test_quantile_is_pure_projection(self, values_df):
        sk = hist_build(values_df, ["g"], "v", 0.0, 1000.0, n_bins=16)
        sk = sk.localCheckpoint()  # isolate: only the estimate's own plan
        plan = hist_quantile(sk, [0.5, 0.9], 0.0, 1000.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_validation(self, values_df):
        sk = hist_build(values_df, ["g"], "v", 0.0, 1000.0, n_bins=8)
        with pytest.raises(ValueError, match="no quantiles"):
            hist_quantile(sk, [], 0.0, 1000.0)
        with pytest.raises(ValueError, match="out of"):
            hist_quantile(sk, [1.5], 0.0, 1000.0)


class TestMisraGries:
    """Two-phase exact frequent items (sketches.mg_summary /
    frequent_items_exact): eviction actually exercised (domain ≫
    capacity), candidate supersets provable, final output exactly the
    full-domain answer, state bounded by partitions × capacity."""

    def _zipf_df(self, spark):
        # 2 true heavy hitters over a 3000-item tail: domain 3002 ≫
        # capacity 16, so per-partition summaries must evict.
        rows = ([(100000,)] * 3000 + [(100001,)] * 1500
                + [(i,) for i in range(3000)]
                + [(i,) for i in range(1500)])
        return spark.createDataFrame(rows, ["item"]).repartition(8)

    def test_exact_output_matches_full_domain_answer(self, spark):
        from pyspark.sql import functions as F

        from bloomy_etl_spark.operators.sketches import frequent_items_exact

        df = self._zipf_df(spark)
        n = df.count()
        k = 10
        want = {
            (r["item"], r["n"])
            for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") * k >= n).collect()
        }
        got = {
            (r["item"], r["n_items"])
            for r in frequent_items_exact(df, "item", k=k,
                                          capacity=16).collect()
        }
        assert got == want
        assert {i for i, _ in got} == {100000, 100001}

    def test_summary_bounded_and_undercounts_only(self, spark):
        from pyspark.sql import functions as F

        from bloomy_etl_spark.operators.sketches import mg_summary

        df = self._zipf_df(spark)
        parts = df.rdd.getNumPartitions()
        cap = 16
        summ = mg_summary(df, "item", capacity=cap).collect()
        assert len(summ) <= parts * cap
        true = {r["item"]: r["n"]
                for r in df.groupBy("item")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
        merged = {}
        for r in summ:
            assert r["mg_wt"] >= 1
            merged[r["item"]] = merged.get(r["item"], 0) + r["mg_wt"]
        for item, wt in merged.items():
            assert wt <= true[item], f"MG over-counted {item}"

    def test_capacity_one_and_validation(self, spark):
        import pytest

        from bloomy_etl_spark.operators.sketches import (
            frequent_items_exact,
            mg_summary,
        )

        df = spark.createDataFrame([(1,)] * 9 + [(2,)], ["item"]) \
            .repartition(1)
        # capacity 1 keeps only the majority candidate; recount is exact
        got = {(r["item"], r["n_items"])
               for r in frequent_items_exact(df, "item", k=2,
                                             capacity=1).collect()}
        assert got == {(1, 9)}
        with pytest.raises(ValueError):
            mg_summary(df, "item", capacity=0)
        with pytest.raises(ValueError):
            frequent_items_exact(df, "item", k=0)
