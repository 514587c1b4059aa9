"""Operator-level semantics for the corpus-assembly module
(operators/corpus.py): sessionization boundaries, decontamination
direction, split determinism, packing conservation, percentile
interpolation, top-k tie-breaks.

(The q43–q48 oracle comparisons run via the parametrized
tests/test_llm_corpus.py sweep; these tests pin the semantics on
constructed inputs where the expected answer is known by hand.)
"""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators import corpus as C

from tests.conftest import SF_ORACLE


def _ts(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: three events inside one hour, then a 5-hour jump
        (1, _ts(0), 10.0, 100),
        (1, _ts(0, 30), 10.0, 101),
        (1, _ts(1), 10.0, 102),
        (1, _ts(6), 10.0, 103),
        # user 2: single event
        (2, _ts(3), 5.0, 200),
        # user 3: gap exactly equal to the threshold must NOT break
        (3, _ts(0), 1.0, 300),
        (3, _ts(2), 1.0, 301),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")


class TestSessionize:
    GAP = 2 * 3600  # 2 hours

    def test_session_boundaries(self, tiny_events):
        out = {
            (r["user_id"], r["event_id"]): r["session_seq"]
            for r in C.sessionize(tiny_events, gap_s=self.GAP).collect()
        }
        # user 1: events 100-102 chain (gaps 30m, 30m), 103 breaks (5h)
        assert out[(1, 100)] == out[(1, 101)] == out[(1, 102)] == 1
        assert out[(1, 103)] == 2
        # single event user: one session
        assert out[(2, 200)] == 1
        # gap == threshold is NOT a break (strictly greater breaks)
        assert out[(3, 300)] == out[(3, 301)] == 1

    def test_summary_rollup(self, tiny_events):
        rows = {
            (r["user_id"], r["session_seq"]): r
            for r in C.session_summary(tiny_events, gap_s=self.GAP).collect()
        }
        s = rows[(1, 1)]
        assert s["n_events"] == 3
        assert s["session_start"] == _ts(0) and s["session_end"] == _ts(1)
        assert s["sum_value"] == 30.0
        assert rows[(1, 2)]["n_events"] == 1


class TestContamination:
    def test_direction_and_exclusion(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon"),  # benchmark
                (1, "alpha beta gamma something else entirely"),  # overlaps
                (2, "zero overlap with anything here at all"),  # clean
            ],
            "doc_id long, text string",
        )
        hits = C.contamination_hits(docs, F.col("doc_id") == 0).collect()
        flagged = {r["doc_id"]: r["n_hit_shingles"] for r in hits}
        assert 0 not in flagged, "benchmark docs must never self-flag"
        assert 2 not in flagged
        # doc 1 shares exactly one distinct 3-gram: 'alpha beta gamma'
        assert flagged == {1: 1}


class TestSplit:
    def test_total_and_determinism(self, spark):
        from bloomy_etl_spark.sources.tables import load_table

        docs = load_table(spark, SF_ORACLE, "documents")
        a = C.assign_split(docs).groupBy("split").count().collect()
        counts = {r["split"]: r["count"] for r in a}
        total = sum(counts.values())
        assert total == docs.count()
        # 90/5/5 bands with binomial slack on 500 docs
        assert counts["train"] / total == pytest.approx(0.90, abs=0.06)
        # determinism under repartitioning: identical per-doc assignment
        b = C.assign_split(docs.repartition(7)).select("doc_id", "split")
        merged = (
            C.assign_split(docs)
            .select("doc_id", F.col("split").alias("s1"))
            .join(b, "doc_id")
        )
        assert merged.filter(F.col("s1") != F.col("split")).count() == 0


class TestPacking:
    def test_token_conservation_and_bounds(self, spark):
        from bloomy_etl_spark.functions.text import bpe_ish_token_count
        from bloomy_etl_spark.sources.tables import load_table

        budget = 512
        docs = load_table(spark, SF_ORACLE, "documents")
        bins = C.pack_sequences(docs, budget=budget).cache()
        total_binned = bins.agg(F.sum("bin_tokens")).first()[0]
        total_raw = docs.agg(F.sum(bpe_ish_token_count(F.col("text")))).first()[0]
        assert total_binned == total_raw, "packing must conserve tokens"
        assert bins.filter(F.col("bin_id") < 0).count() == 0
        # bin count per partition bounded by ceil(total/budget) + 1
        per_part = bins.groupBy("lang").agg(
            F.max("bin_id").alias("max_bin"), F.sum("bin_tokens").alias("tot")
        )
        bad = per_part.filter(
            F.col("max_bin") > F.ceil(F.col("tot") / F.lit(budget))
        ).count()
        assert bad == 0
        bins.unpersist()


class TestProfiling:
    def test_percentiles_match_numpy(self, spark):
        vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 100)]
        df = spark.createDataFrame(
            [("x", v) for v in vals], "lang string, n_chars double"
        )
        row = C.length_percentiles(df).first()
        for col, p in (("p25", 25), ("p50", 50), ("p90", 90), ("p99", 99)):
            assert row[col] == pytest.approx(
                round(float(np.percentile(vals, p)), 4)
            ), col

    def test_top_ngrams_tiebreak(self, spark):
        docs = spark.createDataFrame(
            [(0, "b b b b"), (1, "a a a a")], "doc_id long, text string"
        )
        # grams: 'b b b' x2, 'a a a' x2 — tie broken lexicographically
        out = C.top_ngrams(docs, n=3, k=1).collect()
        assert len(out) == 1 and out[0]["gram"] == "a a a"


class TestBloomDecontam:
    def test_bloom_is_superset_and_tight(self, spark):
        """The Bloom path may only ADD candidates (false positives), never
        lose one (no false negatives) — and at fpp=1e-4 on the fixture's
        ~15k probes it should add at most a couple."""
        from bloomy_etl_spark.sources.tables import load_table

        docs = load_table(spark, SF_ORACLE, "documents")
        pred = F.col("doc_id") % 97 == 0
        exact = {
            r["doc_id"]
            for r in C.contamination_hits(docs, pred).collect()
        }
        bloom = {
            r["doc_id"]
            for r in C.contamination_hits(docs, pred, method="bloom").collect()
        }
        assert exact <= bloom, "bloom must never drop a true hit"
        assert len(bloom) <= len(exact) + 5, (
            f"too many false positives: {len(bloom)} vs {len(exact)}"
        )
