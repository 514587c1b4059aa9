"""Measured scale claims (tools/profile.py): the plan-shape tests in
test_plans.py assert what the plan SAYS; these assert what the
execution DID — real shuffle bytes and records from the SQLMetric
accumulators. A claim like "the corpus never shuffles" or "shuffle
volume is bounded by the sketch size, not the key cardinality" becomes
a number the test compares against the data's actual size."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloomy_etl_spark.sources.tables import load_table
from bloomy_etl_spark.tools.profile import run_profile
from tests.conftest import SF_SMOKE


def test_split_assignment_moves_zero_shuffle_bytes(spark):
    """q47's operator claims shuffle-free determinism — measured: the
    execution writes 0 shuffle bytes, not just 'no Exchange in plan'."""
    from bloomy_etl_spark.operators.corpus import assign_split

    docs = load_table(spark, SF_SMOKE, "documents")
    p = run_profile(assign_split(docs, train_pct=80, val_pct=10))
    assert p["shuffle_bytes_written"] == 0
    assert p["output_rows"] == docs.count()


def test_chunking_moves_zero_shuffle_bytes(spark):
    from bloomy_etl_spark.operators.corpus import chunk_documents

    docs = load_table(spark, SF_SMOKE, "documents")
    p = run_profile(chunk_documents(docs, window=64, stride=48))
    assert p["shuffle_bytes_written"] == 0
    assert p["output_rows"] >= docs.count()  # explode only adds rows


def test_cms_shuffle_bounded_by_sketch_not_corpus(spark):
    """The CMS build's entire point: shuffle volume tracks d×w counter
    cells, NOT distinct-token cardinality. Measured: the shuffle writes
    no more records than partitions × (d×w) partial cells, far below
    the corpus' token count."""
    from bloomy_etl_spark.operators.sketches import cms_build
    from bloomy_etl_spark.functions.text import tokens

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    n_tokens = toks.count()
    depth, width = 4, 64
    p = run_profile(cms_build(toks, "tok", depth=depth, width=width))
    cells = depth * width
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    assert 0 < p["shuffle_records_written"] <= cells * n_parts
    assert p["shuffle_records_written"] < n_tokens


def test_hist_shuffle_bounded_by_groups_times_bins(spark):
    """The histogram sketch's bound, measured: level-1 map-side combine
    means the shuffle carries at most groups × (n_bins+2) cell rows plus
    the level-2 assembly, never the row count."""
    from bloomy_etl_spark.operators.sketches import hist_build

    ev = load_table(spark, SF_SMOKE, "events")
    n_rows = ev.count()
    n_groups = ev.select("event_type").distinct().count()
    n_bins = 32
    p = run_profile(hist_build(ev, ["event_type"], "value",
                               lo=0.0, hi=100.0, n_bins=n_bins))
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    bound = n_groups * (n_bins + 2) * n_parts + n_groups * n_parts
    assert 0 < p["shuffle_records_written"] <= bound
    assert p["shuffle_records_written"] < n_rows


def test_mixture_sample_corpus_never_shuffles(spark):
    """q50's scale story, measured: only the tiny per-language rate
    table moves through a shuffle; corpus rows reach the output without
    one. Shuffle records must be O(languages), not O(documents)."""
    from bloomy_etl_spark.operators.corpus import mixture_sample

    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    n_langs = docs.select("lang").distinct().count()
    p = run_profile(mixture_sample(docs, alpha=0.7))
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    assert p["shuffle_records_written"] <= n_langs * (n_parts + 2)
    assert p["shuffle_records_written"] < n_docs


def test_bloom_semi_join_prefilter_shrinks_the_shuffle(spark):
    """q78's runtime-filter claim, measured: with the Bloom prefilter
    dropping non-matching rows MAP-SIDE, the shuffle carries
    O(matches + false positives) records — far below the big side's
    row count, and verifiably close to the true match count."""
    from bloomy_etl_spark.operators.joins import bloom_semi_join

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    # a selective small side: ~4% of orders
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderkey") % 25 == 0)
        .select("o_orderkey")
    )
    n_big = li.count()
    n_match = li.join(orders, li.l_orderkey == orders.o_orderkey,
                      "left_semi").count()
    # fixture tables are broadcast-small, which would give ZERO
    # exchanges (the claim trivially true); force shuffle joins so the
    # exchange exists and its record count is measurable
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = run_profile(
            bloom_semi_join(li.withColumnRenamed("l_orderkey", "k"),
                            orders.withColumnRenamed("o_orderkey", "k"),
                            on="k")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert p["output_rows"] == n_match
    # every exchange in the plan moves fewer records than the raw big
    # side — the prefilter ran before the shuffle, not after
    assert 0 < p["shuffle_records_written"] < n_big
    # and the shuffled stream is match-sized: both join inputs plus the
    # bitmap words, with false positives allowed some slack
    assert p["shuffle_records_written"] <= 3 * n_match + 1000


def test_novelty_shuffle_linear_in_gram_stream(spark):
    """q133's operator claims NO gram-grain join back to the corpus:
    the exchange carries the two gram-keyed agg partials plus two
    doc-grain count tables — measured: shuffle records stay within a
    small multiple of the distinct-gram stream, far below the
    quadratic join-back shape."""
    from bloomy_etl_spark.functions.text import word_ngrams
    from bloomy_etl_spark.operators.corpus import first_seen_novelty

    docs = load_table(spark, SF_SMOKE, "documents", fan_out=True)
    n_docs = docs.count()
    n_gram_rows = docs.select(
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 2))).alias("g")
    ).count()
    p = run_profile(first_seen_novelty(docs, n=2))
    assert p["output_rows"] == n_docs
    # two gram-keyed aggs (≤ gram stream each after map-side combine)
    # + two doc-grain tables; 3× covers partials without admitting a
    # join-back (which would add ≥ 2× the full stream again)
    assert 0 < p["shuffle_records_written"] <= 3 * n_gram_rows + 4 * n_docs


def test_temperature_quotas_shuffle_bounded_by_groups(spark):
    """q132's apportionment never exchanges corpus rows: the only
    shuffled records are the G-row count partials and the G-row window
    frames — measured against the actual source count."""
    from bloomy_etl_spark.operators.corpus import temperature_quotas

    docs = load_table(spark, SF_SMOKE, "documents")
    n_groups = docs.select("source").distinct().count()
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    quotas = temperature_quotas(docs, budget=200)
    assert quotas.count() == n_groups
    p = run_profile(quotas)
    # count partials: ≤ groups × map tasks; window frames: ≤ 3 G-row
    # passes (rem sort + two unbounded windows share one frame)
    assert 0 < p["shuffle_records_written"] <= n_groups * (n_parts + 4)


def test_gopher_repetition_one_gram_shuffle_then_doc_grain(spark):
    """q137's shape claim, measured: the tagged bigram+trigram stream
    aggregates through ONE (doc, n, gram)-keyed exchange whose record
    count never exceeds the gram-occurrence stream (map-side combine
    can only shrink it), and the result lands back at document grain."""
    from bloomy_etl_spark.functions.text import word_ngrams
    from bloomy_etl_spark.operators.corpus import gopher_repetition

    docs = load_table(spark, SF_SMOKE, "documents")
    n_grams = docs.select(
        F.explode(word_ngrams(F.col("text"), 2)).alias("g")
    ).count() + docs.select(
        F.explode(word_ngrams(F.col("text"), 3)).alias("g")
    ).count()
    p = run_profile(gopher_repetition(docs))
    assert p["output_rows"] == docs.count()
    assert 0 < p["shuffle_records_written"] <= 2 * n_grams


def test_char_entropy_shuffle_bounded_by_alphabet_not_chars(spark):
    """q138's bound, measured: the (doc, char) partials cap the
    exchange at docs × alphabet, far below the character stream the
    explode produces."""
    from bloomy_etl_spark.operators.corpus import char_entropy

    docs = load_table(spark, SF_SMOKE, "documents")
    n_chars = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s", "")))
    ).collect()[0][0]
    alphabet = 128  # the fixture is ASCII; the bound is docs × |Σ|
    p = run_profile(char_entropy(docs))
    assert p["output_rows"] == docs.count()
    assert 0 < p["shuffle_records_written"] < n_chars
    assert p["shuffle_records_written"] <= docs.count() * alphabet


def test_kcenter_corpus_rows_never_shuffle(spark):
    """q139's coverage rollup is the operator's ONLY exchange: k-key
    count partials plus the k-row broadcast join — corpus rows never
    enter an exchange (the selection rounds are TakeOrdered maps)."""
    from bloomy_etl_spark.operators.clustering import kcenter_greedy

    embs = load_table(spark, SF_SMOKE, "embeddings")
    k = 8
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    p = run_profile(kcenter_greedy(embs, k=k))
    assert p["output_rows"] == k
    assert p["shuffle_records_written"] <= k * (n_parts + 1)
    assert p["shuffle_records_written"] < embs.count()


def test_mg_shuffle_bounded_by_summaries_not_domain(spark):
    """q146's entire point at 100 TB: the frequent-set pass must not
    shuffle a row per distinct key. Measured on the MG phase: shuffle
    records are bounded by input partitions × (capacity + sentinel) —
    the recount joins a broadcast candidate set, so the only other
    shuffle is candidate-sized, never domain-sized."""
    from bloomy_etl_spark.operators.sketches import mg_summary

    ev = load_table(spark, SF_SMOKE, "events").select("user_id")
    n_rows = ev.count()
    cap = 8
    summ = mg_summary(ev, "user_id", capacity=cap, with_part_totals=True)
    in_parts = ev.rdd.getNumPartitions()
    p = run_profile(summ.groupBy("user_id").agg(F.sum("mg_wt").alias("w")))
    assert p["shuffle_records_written"] <= in_parts * (cap + 1)
    assert p["shuffle_records_written"] < n_rows


def test_lpa_round_shuffle_linear_in_edges(spark):
    """One LPA round's shuffles are bounded by the directed edge list
    (the nbr join + the (node, label) histogram) — no quadratic blowup
    at any round. Measured at rounds=1 on the smoke supplier graph."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES
    from bloomy_etl_spark.operators.graph import label_propagation

    li = load_table(spark, SF_SMOKE, "lineitem")
    os_ = li.select(F.col("l_orderkey").alias("o"),
                    F.col("l_suppkey").alias("s")).distinct()
    edges = (
        os_.select("o", F.col("s").alias("x"))
        .join(os_.select("o", F.col("s").alias("y")), "o")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y").agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2).drop("w")
    )
    m = edges.count()  # undirected edges; directed stream is 2m
    p = run_profile(label_propagation(edges, rounds=1))
    # per round: ≤ 2m rows into the nbr join, ≤ 2m partial (node,label)
    # cells into the histogram agg, ≤ n window rows — all linear in m
    assert p["shuffle_records_written"] <= 6 * (2 * m) + 4
    # regression canary: ENGINE_QUERIES wiring still builds the same graph
    assert ENGINE_QUERIES["q145_supplier_communities"] is not None


def test_cusum_shuffle_records_bounded_by_keys(spark):
    """q149's fold shuffles the VALUES once (inherent: every
    observation reaches its key's fold), but as per-partition partial
    collect_list rows — the record count is bounded by keys × map
    partitions, never by observations."""
    from bloomy_etl_spark.operators.timeseries import cusum_alerts

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    n_events = ev.count()
    n_keys = ev.select("user_id").distinct().count()
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    p = run_profile(cusum_alerts(ev, drift=700_000, threshold=3_000_000))
    # partial-agg rows (+ the presentation-sort re-exchange of the
    # key-grain result), never the raw event rows
    assert 0 < p["shuffle_records_written"] <= 2 * n_keys * n_parts
    assert p["shuffle_records_written"] < n_events


def test_majority_vote_shuffle_is_count_grain_not_vote_grain(spark):
    """q151's shuffle carries (item, label) partial counts — bounded by
    item×label domain × partitions, far below the raw vote count."""
    from bloomy_etl_spark.operators.labels import majority_vote

    votes = load_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("item"),
        F.col("event_type").alias("label"),
    )
    n_votes = votes.count()
    n_cells = votes.distinct().count()
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    p = run_profile(majority_vote(votes, min_share_e6=400_000))
    assert 0 < p["shuffle_records_written"] <= 2 * n_cells * n_parts
    assert p["shuffle_records_written"] < n_votes


def test_zorder_ships_the_corpus_once_plus_bounded_frames(spark):
    """q150's layout rewrite must move each row to its rank bucket
    exactly ONCE; everything else it exchanges is the 256-row offset
    frame and file-grain aggregate partials. Measured: total shuffle
    records stay under corpus + bounded terms — no second corpus
    pass, no join-back of rank tables."""
    from bloomy_etl_spark.operators.zorder import zone_maps, zorder_files

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("xb"),
        F.pmod(F.datediff(F.col("ts").cast("date"),
                          F.lit("2024-01-01").cast("date")),
               F.lit(256)).cast("long").alias("yb"),
    )
    n_rows = ev.count()
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    buckets, files = 256, n_rows // 500 + 1
    laid = zorder_files(ev, "xb", "yb", "event_id", rows_per_file=500)
    p = run_profile(zone_maps(laid, "xb", "yb"))
    bound = n_rows + n_parts * (buckets + files) + buckets
    assert 0 < p["shuffle_records_written"] <= bound


def test_bradley_terry_duel_log_never_shuffles(spark):
    """q154's rounds iterate over the item/pair tables only: the raw
    duel log is reduced by partial aggregation before the exchange, so
    total shuffle records across ALL rounds stay below the duel
    count."""
    from bloomy_etl_spark.operators.preference import bradley_terry

    ev = load_table(spark, SF_SMOKE, "events")
    duels = (
        ev.alias("a")
        .join(ev.alias("b"), "user_id")
        .filter(F.col("a.event_id") < F.col("b.event_id"))
        .select(
            F.col("a.event_type").alias("winner"),
            F.col("b.event_type").alias("loser"),
        )
        .filter(F.col("winner") != F.col("loser"))
        .limit(20000)
    )
    duels = duels.localCheckpoint()  # freeze: profile only the fit
    n_duels = duels.count()
    p = run_profile(bradley_terry(duels, rounds=3))
    assert n_duels == 20000
    # the wins/pairs reductions are pinned at construction and the
    # item-grain round tables broadcast under AQE — the profiled fit
    # can legitimately measure ZERO shuffle records; the contract is
    # only that it never re-ships the duel log
    assert 0 <= p["shuffle_records_written"] < n_duels


def test_twa_shuffle_records_bounded_by_keys(spark):
    """q160's lead window and aggregate ride one key partitioning: the
    exchange carries event rows once to their key, and the aggregate's
    partials are key-grain."""
    from bloomy_etl_spark.operators.timeseries import time_weighted_avg

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    n_events = ev.count()
    p = run_profile(time_weighted_avg(ev))
    # one corpus move to the window partitioning + key-grain partials;
    # never a second corpus pass
    assert 0 < p["shuffle_records_written"] <= n_events + 4 * 150


def test_attribution_is_one_window_pass(spark):
    """q162: no join against a touches table — the packed-MAX LOCF
    means the only exchange is the one user partitioning (plus the
    purchase-grain presentation sort)."""
    from bloomy_etl_spark.operators.engine_queries import ENGINE_QUERIES

    out = ENGINE_QUERIES["q162_touch_attribution"](spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    p = run_profile(out)
    assert 0 < p["shuffle_records_written"] <= 2 * n_events
