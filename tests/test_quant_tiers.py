"""Unit tests for the r8 quantization-tier ANN queries (q109–q111) and
co-occurrence lift mining (q112) — semantics the generic oracle
comparison can't state: self-match ranks, recall floors, and the
in-row-pairs shuffle shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloomy_etl_spark.operators.ann_queries import ANN_QUERIES
from bloomy_etl_spark.operators.corpus import cooccurrence_lift
from bloomy_etl_spark.sources.tables import load_table

from tests.conftest import SF_ORACLE


def _top1(df):
    return {
        r["query_id"]: r["neighbor_id"]
        for r in df.filter(F.col("rank") == 1).collect()
    }


class TestQuantTierSelfMatch:
    """Every tier's similarity is maximal (distance minimal) at the
    query itself, and rank-1 ties break to the lower id — so each
    query's top-1 must be a vector whose codes equal the query's own
    (usually itself)."""

    def test_sq8_self_rank1_score(self, spark):
        out = ANN_QUERIES["q109_sq8_topk"](spark, SF_ORACLE).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], {})[r["neighbor_id"]] = r
        for q, rows in by_q.items():
            assert q in rows, f"query {q} missing from its own top-5"
            # cosine of identical codes is exactly 1 after rounding
            assert rows[q]["sq_cos"] == 1.0

    def test_hamming_self_distance_zero(self, spark):
        out = ANN_QUERIES["q110_binary_hamming_topk"](spark, SF_ORACLE)
        rows = out.collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], {})[r["neighbor_id"]] = r
        for q, nbrs in by_q.items():
            assert q in nbrs and nbrs[q]["hamming"] == 0
            # rank 1 is the LOWEST-id zero-distance neighbor
            r1 = min(
                (r for r in nbrs.values() if r["rank"] == 1),
                key=lambda r: r["neighbor_id"],
            )
            assert r1["hamming"] == 0

    def test_jl_self_rank(self, spark):
        out = ANN_QUERIES["q111_jl_projection_topk"](spark, SF_ORACLE)
        top = _top1(out)
        for q, n in top.items():
            assert n == q, f"JL projection lost self-similarity for {q}"


class TestQuantTierRecall:
    """The tiers must carry signal: against exact-cosine top-5 (ground
    truth), each query's approximate top-5 overlaps in at least 1 of 5
    — a floor, not a benchmark (the fixture corpus is tiny)."""

    def _exact_top5(self, spark):
        from bloomy_etl_spark.functions import vectors as V

        embs = load_table(spark, SF_ORACLE, "embeddings")
        q = embs.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        c = embs.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")
        )
        from pyspark.sql import Window

        wk = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id").asc()
        )
        out = (
            c.join(F.broadcast(q), F.lit(True))
            .withColumn("cos", V.cosine(F.col("qv"), F.col("nv")))
            .withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= 5)
        )
        truth = {}
        for r in out.collect():
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return truth

    def test_overlap_floor(self, spark):
        truth = self._exact_top5(spark)
        for name in ("q109_sq8_topk", "q110_binary_hamming_topk",
                     "q111_jl_projection_topk"):
            got = {}
            for r in ANN_QUERIES[name](spark, SF_ORACLE).collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            assert got.keys() == truth.keys()
            for q in truth:
                overlap = len(truth[q] & got[q])
                assert overlap >= 1, (name, q, truth[q], got[q])

    def test_sq8_is_near_exact(self, spark):
        """Int8 over 64 dims loses almost nothing — SQ8 top-5 should
        essentially reproduce the exact top-5 (≥4/5 per query)."""
        truth = self._exact_top5(spark)
        got = {}
        for r in ANN_QUERIES["q109_sq8_topk"](spark, SF_ORACLE).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for q in truth:
            assert len(truth[q] & got[q]) >= 4, (q, truth[q], got[q])


class TestCooccurrenceShape:
    def test_pairs_are_ordered_and_bounded(self, spark):
        docs = load_table(spark, SF_ORACLE, "documents")
        out = cooccurrence_lift(docs, vocab_size=16, top=50).collect()
        assert 0 < len(out) <= 50
        for r in out:
            assert r["t1"] < r["t2"]
            assert r["n_ab"] >= 1 and r["lift"] > 0

    def test_no_corpus_token_shuffle(self, spark):
        """Pair generation is in-row: the pair-count exchange carries
        pair-group partials (≤ vocab²/2 keys per task), never the
        exploded token stream. Bound: with vocab=16 there are ≤ 120
        distinct pairs, so shuffle records ≤ 120 · tasks — far below
        the corpus token count (~37k tokens at sf0.01)."""
        from bloomy_etl_spark.tools.profile import run_profile

        docs = load_table(spark, SF_ORACLE, "documents")
        prof = run_profile(cooccurrence_lift(docs, vocab_size=16, top=50))
        parallelism = spark.sparkContext.defaultParallelism
        assert prof["spill_bytes"] == 0
        assert prof["shuffle_records_written"] <= 120 * (parallelism + 2), (
            prof["shuffle_records_written"]
        )

    def test_lift_identity_on_constructed_corpus(self, spark):
        """Hand corpus: 'a b' always together (lift = N/n_a·n_b · n_ab
        maximal), 'a c' never — c pairs only with its own partner."""
        rows = [(i, "a b filler%d" % (i % 3)) for i in range(8)]
        rows += [(100 + i, "c d") for i in range(4)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            (r["t1"], r["t2"]): r
            for r in cooccurrence_lift(docs, vocab_size=10, top=100).collect()
        }
        n = 12
        ab = out[("a", "b")]
        assert ab["n_ab"] == 8
        assert ab["lift"] == round(8 * n / (8 * 8), 6)
        cd = out[("c", "d")]
        assert cd["n_ab"] == 4
        assert cd["lift"] == round(4 * n / (4 * 4), 6)
        assert ("a", "c") not in out


class TestPrefixJaccardJoin:
    """prefix_jaccard_join is EXACT: identical verified output to the
    uncapped inverted-index operator, from a fraction of the postings."""

    def test_equivalence_with_uncapped_ngram_pairs(self, spark):
        from bloomy_etl_spark.operators.dedup import (
            ngram_jaccard_pairs,
            prefix_jaccard_join,
        )

        docs = load_table(spark, SF_ORACLE, "documents")
        for t in (0.7, 0.85):
            ref = {
                (r["i"], r["j"]): round(r["jaccard"], 9)
                for r in ngram_jaccard_pairs(docs, threshold=t).collect()
            }
            got = {
                (r["i"], r["j"]): round(r["jaccard"], 9)
                for r in prefix_jaccard_join(docs, threshold=t).collect()
            }
            assert got == ref, (
                t,
                set(ref) - set(got),
                set(got) - set(ref),
            )
            assert ref, f"threshold {t} matched nothing — test is vacuous"

    def test_prefix_postings_are_a_fraction(self, spark):
        """The filter must actually filter: prefix index entries ≤
        ~(1−t)·|full index| + 1 per doc (the whole point at scale)."""
        from pyspark.sql import functions as F
        from bloomy_etl_spark.operators import dedup as D
        from pyspark.sql.types import (
            IntegerType, LongType, StructField, StructType,
        )

        docs = load_table(spark, SF_ORACLE, "documents")
        idx = docs.select(
            F.col("doc_id"), F.col("text")
        ).mapInPandas(
            D._span_fingerprint_batches(3, with_counts=True),
            StructType([
                StructField("doc_id", LongType()),
                StructField("n_sh", IntegerType()),
                StructField("span", LongType()),
            ]),
        )
        full = idx.count()
        t = 0.8
        per_doc = idx.groupBy("doc_id", "n_sh").count().collect()
        prefix_bound = sum(
            int(r["n_sh"] - (t * r["n_sh"] // 1)) + 1 for r in per_doc
        )
        # bound ≈ 20% of full at t=0.8 (plus one per doc)
        assert prefix_bound < 0.35 * full + len(per_doc)


def test_tier_accuracy_ordering_via_retrieval_metrics(spark):
    """The engine's own audit (similarity.retrieval_metrics) must rank
    the tiers the way their information budgets predict on the fixture:
    8-bit SQ recall@10 ≥ 1-bit Hamming recall@10, per mean over the
    query set. Deterministic — fixed data, exact metrics."""
    from bloomy_etl_spark.operators.ann_queries import ANN_QUERIES
    from bloomy_etl_spark.operators.similarity import (
        cosine_topk,
        retrieval_metrics,
    )
    from bloomy_etl_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE

    embs = load_table(spark, SF_ORACLE, "embeddings")
    truth = cosine_topk(embs, embs.filter(F.col("vec_id") % 100 == 0), k=10)

    def mean_recall(result):
        rows = retrieval_metrics(result, truth, k=10).collect()
        return sum(r["n_hits"] for r in rows) / (10.0 * len(rows))

    # both tier queries emit (query_id, neighbor_id, ..., rank<=5);
    # rebuild at k=10 via their gated k=5 lists is not enough for
    # recall@10, so re-rank through the q126 shapes: Hamming from the
    # gate file, SQ8 re-run with a wider rank filter
    ham = ANN_QUERIES["q126_ann_recall"]  # sanity: callable exists
    assert callable(ham)
    from bloomy_etl_spark.operators.ann_queries import _sign_word
    from pyspark.sql import Window

    packed = embs.select(
        "vec_id",
        _sign_word(F.col("embedding"), 1).alias("w0"),
        _sign_word(F.col("embedding"), 33).alias("w1"),
    )
    corpus = packed.select(F.col("vec_id").alias("neighbor_id"), "w0", "w1")
    queries = packed.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("u0"), F.col("w1").alias("u1"),
    )
    hamd = (
        F.bit_count(F.col("w0").bitwiseXOR(F.col("u0")))
        + F.bit_count(F.col("w1").bitwiseXOR(F.col("u1")))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    ham_res = (
        corpus.join(F.broadcast(queries), F.lit(True))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("hamming", hamd.cast("int"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= 10)
    )
    # SQ8: scalar-quantize to int8 per coordinate, score by dot of
    # dequantized values against the raw query (the q109 shape, k=10)
    from bloomy_etl_spark.functions.vectors import dot, norm

    lo, hi = -4.0, 4.0
    scale = (hi - lo) / 255.0
    deq = F.transform(
        F.col("embedding"),
        lambda x: (
            F.round((F.least(F.greatest(x.cast("double"), F.lit(lo)),
                             F.lit(hi)) - F.lit(lo)) / F.lit(scale))
            * F.lit(scale) + F.lit(lo)
        ),
    )
    sq = embs.select(F.col("vec_id").alias("neighbor_id"), deq.alias("dv"))
    qs = embs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("nq"),
    )
    wk2 = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("neighbor_id").asc()
    )
    sq_res = (
        sq.join(F.broadcast(qs), F.lit(True))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("s", dot(F.col("dv"), F.col("qv"))
                    / (norm(F.col("dv")) * F.col("nq")))
        .withColumn("rank", F.row_number().over(wk2))
        .filter(F.col("rank") <= 10)
    )
    r_ham, r_sq = mean_recall(ham_res), mean_recall(sq_res)
    assert 0.0 < r_ham < 1.0  # the 1-bit tier genuinely loses accuracy
    assert r_sq >= r_ham, (r_sq, r_ham)
    assert r_sq >= 0.9  # 8-bit over [-4,4] is near-lossless on the fixture
