"""Declared queries for the round-5 engine surface (q70–q79):
join-strategy operators (``operators/joins.py``: binned range, salted
skew, SymSpell fuzzy, Bloom-reduced semi), the one-pass quality suite
(``operators/checks.py``), incremental aggregate maintenance
(``operators/incremental.py``), SCD2 dimension history
(``sinks/layout.py::scd2_apply``), k-anonymity release audit,
hard-negative mining (``operators/similarity.py``), and KMV sketch set
operations (``operators/sketches.py``).

Contract as everywhere (§2.10): total order, floats rounded, identical
column aliases in the Spark builder and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloomy_etl_spark.operators import checks
from bloomy_etl_spark.operators.incremental import (
    finalize,
    merge_states,
    partial_states,
)
from bloomy_etl_spark.operators.joins import binned_range_join, salted_join
from bloomy_etl_spark.output import presentation_sort as _psort
from bloomy_etl_spark.session import pin
from bloomy_etl_spark.sources.tables import load_table as _load


def _t(spark: SparkSession, sf_dir: str, name: str, **kw) -> DataFrame:
    return _load(spark, sf_dir, name, **kw)


_EPOCH = "1992-01-01"


# --------------------------------------------------------------------------
# Q70 — binned range join: for each distinct lineitem ship day, how many
# orders are "open" (within 30 days after their order date). A pure
# range predicate with NO equi key — naively a BroadcastNestedLoopJoin;
# the bin rewrite makes it a hash-partitioned equi join (plan-tested).
# Both sides pre-aggregate to day grain first, so candidate volume is
# days×~2 bins, independent of row counts — the 100 TB shape.
# --------------------------------------------------------------------------
def q70_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = lambda c: F.datediff(F.col(c), F.lit(_EPOCH).cast("date"))  # noqa: E731
    points = (
        _t(spark, sf_dir, "lineitem")
        .select(day("l_shipdate").cast("long").alias("day"))
        .distinct()
    )
    intervals = (
        _t(spark, sf_dir, "orders")
        .groupBy(day("o_orderdate").cast("long").alias("lo"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("hi", F.col("lo") + 30)
    )
    joined = binned_range_join(points, intervals, "day", "lo", "hi", bin_width=32)
    return (
        joined.groupBy("day")
        .agg(F.sum("n").alias("n_open"))
        .transform(_psort, "day")
    )


# --------------------------------------------------------------------------
# Q71 — salted skew join: lineitem ⋈ orders on orderkey with a 4-way
# salt, aggregated to revenue per order priority. Semantics identical to
# the plain join (the oracle IS the plain join); the salt spreads any
# hot key across 4 tasks and the plan is a shuffle join, never a
# broadcast (plan-tested) — the manual remedy when the "small" side
# outgrows the broadcast threshold and one key dominates.
# --------------------------------------------------------------------------
def q71_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on="orderkey", n_salts=4)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .transform(_psort, "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q72 — one-pass data-quality suite over orders: six constraints, ONE
# aggregate job (adding a constraint adds expressions, never a scan).
# The fixture data passes some and fails others — both outcomes are
# load-bearing (a suite that can't fail verifies nothing).
# --------------------------------------------------------------------------
def q72_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return checks.check_constraints(
        orders,
        [
            checks.not_null("o_custkey"),
            checks.unique("o_orderkey"),
            checks.in_range("o_totalprice", 1.0, 500000.0),
            checks.accepted_values("o_orderstatus", ["F", "O", "P"]),
            checks.matches("o_orderpriority", "^[1-5]-[A-Z]+"),
            checks.non_negative("o_custkey"),
        ],
    )


# --------------------------------------------------------------------------
# Q73 — incremental aggregate maintenance: per-event-type value stats
# maintained as TWO batch states (first half-month, rest) merged and
# finalized — never a recompute over the union. The oracle aggregates
# the whole table directly; equality IS the maintenance invariant.
# --------------------------------------------------------------------------
def q73_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.filter(F.dayofmonth("ts") <= 15)
    delta = ev.filter(F.dayofmonth("ts") > 15)
    state = merge_states(
        partial_states(base, ["event_type"], "value"),
        partial_states(delta, ["event_type"], "value"),
    )
    return finalize(state).transform(_psort, "event_type")


# --------------------------------------------------------------------------
# Q74 — fuzzy matching via the SymSpell bound: all distinct part-name
# pairs within edit distance 2. The oracle is the quadratic
# levenshtein theta join (fine over a 64-name vocabulary); the engine
# path is the deletion-neighborhood equi join that replaces it at scale
# (the quadratic form measured 100 s at just 20k rows).
# --------------------------------------------------------------------------
def q74_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.joins import fuzzy_value_pairs

    part = _t(spark, sf_dir, "part")
    return (
        fuzzy_value_pairs(part, "p_name", k=2)
        .select("a", "b", F.col("dist").cast("long").alias("dist"))
        .transform(_psort, "a", "b")
    )


# --------------------------------------------------------------------------
# Q75 — SCD2 dimension maintenance: the full version history of each
# customer's order status, change-detected and re-chained into
# [eff_ts, end_ts) validity intervals with exactly one open version per
# key. Built INCREMENTALLY (pre-1996 history + later updates through
# scd2_apply); the oracle derives the same chains in one window replay —
# equality is the incremental-maintenance invariant, same contract as
# q73.
# --------------------------------------------------------------------------
def q75_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.sinks.layout import scd2_apply

    obs = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("eff_ts"),
    )
    cut = F.lit("1996-01-01").cast("timestamp")
    empty = obs.filter(F.lit(False))
    dim = scd2_apply(empty, obs.filter(F.col("eff_ts") < cut),
                     ["custkey"], ["status"]).drop("end_ts", "is_current")
    out = scd2_apply(dim, obs.filter(F.col("eff_ts") >= cut),
                     ["custkey"], ["status"])
    return out.transform(_psort, "custkey", "eff_ts", "status")


# --------------------------------------------------------------------------
# Q76 — k-anonymity release audit: quasi-identifiers (segment, nation,
# banded balance) → equivalence-class sizes → per-segment report of
# re-identifiable records. One hash aggregate + one tiny rollup; the
# pre-release privacy gate at any corpus scale.
# --------------------------------------------------------------------------
def q76_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    classes = checks.k_anonymity(
        cust, ["c_mktsegment", "c_nationkey", "bal_band"], k=5
    )
    return checks.k_anonymity_summary(classes, "c_mktsegment").transform(
        _psort, "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Q77 — hard-negative mining for contrastive training: per query vector,
# the top-3 most-similar neighbors whose LABEL differs. Broadcast query
# side, corpus never shuffles, label predicate inside the scoring join.
# --------------------------------------------------------------------------
def q77_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.similarity import hard_negative_mining

    embs = _t(spark, sf_dir, "embeddings", fan_out=True)
    queries = embs.filter(F.col("vec_id") % 100 == 0)
    out = hard_negative_mining(embs, queries, k=3)
    return out.select(
        "query_id", "neighbor_id", "neighbor_label",
        F.round("cos_sim", 4).alias("cos_sim"), "rank",
    ).transform(_psort, "query_id", "rank")


# --------------------------------------------------------------------------
# Q78 — Bloom-reduced semi join: orders kept only for high-balance
# AUTOMOBILE customers. The Bloom bitmap prunes non-matching orders
# MAP-SIDE before any exchange (the explicit form of runtime/dynamic
# filtering); the exact left_semi behind it makes the result identical
# to the plain IN-subquery oracle regardless of false positives.
# --------------------------------------------------------------------------
def q78_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.joins import bloom_semi_join

    orders = _t(spark, sf_dir, "orders")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(
            (F.col("c_mktsegment") == "AUTOMOBILE")
            & (F.col("c_acctbal") > 1000)
        )
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    kept = bloom_semi_join(orders, cust, on="o_custkey")
    return (
        kept.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .transform(_psort, "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q79 — KMV sketch set operations: day-over-day audience overlap
# (returning users, union reach, Jaccard) from per-day bottom-k
# sketches of user_id. k=4096 exceeds every day's distinct count at
# test SFs, so the sketch is in its exact regime and the COUNT(DISTINCT)
# oracle matches bit-for-bit (the k < n estimator regime is
# error-bounded in tests/test_sketches.py) — the q45-percentile split:
# exact path for the oracle, sketch path for scale.
# --------------------------------------------------------------------------
def q79_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators import sketches as SK

    k = 4096
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    sk = SK.kmv_build(ev, ["day"], "user_id", k=k)
    a = sk.select(F.col("day").alias("day_a"), F.col("kmv").alias("ka"))
    b = sk.select(F.col("day").alias("day_b"), F.col("kmv").alias("kb"))
    pairs = a.join(b, F.col("day_b") == F.date_add(F.col("day_a"), 1))
    est = SK.kmv_overlap_cols(F.col("ka"), F.col("kb"), k)
    return pairs.select(
        "day_a",
        "day_b",
        F.round(est["est_a"]).cast("long").alias("est_a"),
        F.round(est["est_b"]).cast("long").alias("est_b"),
        F.round(est["est_union"]).cast("long").alias("est_union"),
        F.round(est["est_inter"]).cast("long").alias("est_inter"),
        F.round(est["jaccard"], 4).alias("jaccard"),
    ).transform(_psort, "day_a")


# --------------------------------------------------------------------------
# Q80 — hypertable-style gap fill: sparse per-user daily purchase series
# densified onto the full daily grid with linear interpolation. The
# engine path is the one-shuffle lead+explode design (timeseries.py —
# the dense grid never exists outside the final map stage); the oracle
# replays it with window + generate_series. Inner AVG is rounded to 6dp
# in BOTH engines before interpolating so the float math starts from
# identical inputs.
# --------------------------------------------------------------------------
def q80_gapfill_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.timeseries import gapfill

    day = (
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("day")
    )
    obs = (
        _t(spark, sf_dir, "events")
        .filter((F.col("user_id") % 5 == 0) & (F.col("event_type") == "purchase"))
        .groupBy("user_id", day)
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )
    # FLOOR(v * 1e4), not ROUND(v, 4): linear midpoints of 6dp-rounded
    # inputs land exactly on .xxxx5, where Spark (half-up) and DuckDB
    # (half-even) disagree; floor of bit-identical doubles cannot.
    return (
        gapfill(obs, ["user_id"], "day", "v", method="linear")
        .select(
            "user_id",
            "day",
            F.floor(F.col("v") * 10000).cast("long").alias("value_e4"),
            "observed",
        )
        .transform(_psort, "user_id", "day")
    )


# --------------------------------------------------------------------------
# Q81 — grid-bucketed spatial radius self-join: all point pairs within
# Euclidean distance 25 on a derived integer point set (spatial.py:
# cell equi join, 3×3 probe replication, exactly-once by construction —
# no distinct, no nested-loop join). Integer coordinates make the
# distance predicate exact, so the O(n²) theta join IS the oracle.
# --------------------------------------------------------------------------
def q81_spatial_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.spatial import radius_self_join

    eid = F.col("event_id")
    pts = (
        _t(spark, sf_dir, "events")
        .filter(eid % 13 == 0)
        .select(
            eid.alias("pid"),
            ((eid * 37) % 1000).cast("double").alias("px"),
            ((eid * 53) % 1000).cast("double").alias("py"),
        )
    )
    return (
        radius_self_join(pts, "pid", "px", "py", 25.0)
        .select("id_a", "id_b", F.col("dist2").cast("long").alias("dist2"))
        .transform(_psort, "id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Q82 — weighted PageRank over the supplier co-purchase graph (edges =
# supplier pairs sharing an order, weight = shared-order count), 3
# rounds, damping 0.85. Per-round 9dp quantization (the k-means trick)
# makes the power iteration exactly replayable — the oracle is the
# 3-round CTE chain. Edge weights are integer-valued doubles, so the
# out-weight normalization is exact in both engines.
# --------------------------------------------------------------------------
def q82_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.graph import basket_pairs, pagerank

    # r9: in-row basket pairs (graph.basket_pairs) replace the self-join
    # edge build (see q141); the directed graph is the ordered pairs
    # unioned with their swap AFTER the aggregate — half the shuffle
    # keys of the old src ≠ dst self-join, identical edge weights.
    und = basket_pairs(
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"),
                F.col("l_suppkey").alias("s")),
        key="o", item="s",
    ).withColumn("w", F.col("w").cast("double"))
    edges = und.select(
        F.col("x").alias("src"), F.col("y").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"), "w")
    )
    ranks = pagerank(edges, weight="w", damping=0.85, rounds=3, quantize_dp=9)
    return ranks.select(
        F.col("node").alias("suppkey"), F.round("rank", 6).alias("rank")
    ).transform(_psort, "suppkey")


# --------------------------------------------------------------------------
# Q83 — CUBE grouping sets: revenue/count over every combination of
# (returnflag, linestatus) incl. both marginals and the grand total in
# ONE pass (completes the grouping-set family next to q13's ROLLUP).
# NULL group labels are coalesced to '__ALL__' with explicit GROUPING()
# flags so sort order is engine-independent.
# --------------------------------------------------------------------------
def q83_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("__ALL__")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("__ALL__")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n_items",
            "revenue",
        )
        .transform(_psort, "g_flag", "g_status", "returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# Q84 — retention cohorts: users grouped by first-active day, distinct
# actives per (cohort, days-since) cell, retention in integer basis
# points (exact integer division — no float share math to diverge).
# The cohort assignment is one agg over the distinct (user, day) set;
# cohort sizes are a tiny broadcast back.
# --------------------------------------------------------------------------
def q84_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One user-keyed shuffle carries the whole analysis: per user,
    # collect the distinct active-day SET in-row (bounded by the
    # calendar span, not by event count), read the cohort day off it
    # with array_min, and explode back. After the explode every
    # (user, day) is unique by construction, so the cell count is a
    # plain COUNT(*) — no count_distinct, no uw⋈cohort self-join (the
    # naive form costs 9 exchanges; this costs 4, two of them tiny).
    day = (
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("day")
    )
    per_user = (
        _t(spark, sf_dir, "events")
        .select("user_id", day)
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
        .withColumn("cohort_day", F.array_min("days"))
    )
    cells = (
        per_user.select("cohort_day", F.explode("days").alias("day"))
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("days_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    # cohort size IS the days_since=0 cell (every user is active on
    # their own cohort day) — a per-cohort window reads it off the
    # aggregate itself instead of a second aggregation + join
    w = Window.partitionBy("cohort_day").orderBy("days_since")
    return (
        cells.withColumn("cohort_size", F.first("n_active").over(w))
        .select(
            "cohort_day",
            "days_since",
            "n_active",
            "cohort_size",
            F.expr("(n_active * 10000) DIV cohort_size").alias("retention_bp"),
        )
        .transform(_psort, "cohort_day", "days_since")
    )


# --------------------------------------------------------------------------
# Q85 — event-transition matrix (path analysis): per-user event streams
# ordered by (ts, event_id), LAG gives the previous step, one agg counts
# each (prev → next) edge and its distinct walkers. The per-user window
# is the only shuffle.
# --------------------------------------------------------------------------
def q85_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .transform(_psort, "prev_type", "next_type")
    )


# --------------------------------------------------------------------------
# Q86 — rolling z-score anomaly flags over the daily per-type series,
# in EXACT integer arithmetic: values enter as floor'd 1e-4 units, and
# |z| > 2 is evaluated as (n·x − S)² > 4·(n·Q − S²) over rolling integer
# sums — algebraically identical to the float z-score but with zero
# cross-engine float divergence (and no σ=0 division hazard).
# --------------------------------------------------------------------------
def q86_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = (
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("day")
    )
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", day)
        .agg(F.floor(F.avg("value") * 10000).cast("long").alias("v_e4"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    n = F.count("v_e4").over(w)
    s = F.sum("v_e4").over(w)
    q = F.sum(F.col("v_e4") * F.col("v_e4")).over(w)
    num = n * F.col("v_e4") - s
    return (
        daily.select(
            "event_type",
            "day",
            "v_e4",
            ((num * num > F.lit(4) * (n * q - s * s)) & (n >= 7)).alias(
                "is_anomaly"
            ),
            n.alias("n_win"),
        )
        .transform(_psort, "event_type", "day")
    )


# --------------------------------------------------------------------------
# Q87 — materialized-view rewrite algebra: per-(type, day) partial
# states (plans/matview.py mergeable monoid), filtered to a day window
# IN STATE SPACE, re-aggregated to per-type grain, finalized. The
# oracle aggregates base rows directly — equality IS the rewrite-
# correctness invariant (a view of finalized averages could never pass
# this; partial states must).
# --------------------------------------------------------------------------
def q87_matview_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.plans.matview import (
        AggQuery,
        answer_from_state,
        build_state,
    )

    day = (
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day")
    )
    state = build_state(
        _t(spark, sf_dir, "events").select("event_type", day, "value"),
        ["event_type", "day"],
        ["value"],
    )
    q = AggQuery(
        keys=("event_type",),
        measures={
            "n_rows": ("count_rows", None),
            "n_val": ("count", "value"),
            "total": ("sum", "value"),
            "mn": ("min", "value"),
            "mx": ("max", "value"),
            "mean": ("avg", "value"),
            "sd": ("stddev_pop", "value"),
        },
        filters=(("day", ">=", 7), ("day", "<=", 21)),
    )
    return answer_from_state(state, q).transform(_psort, "event_type")


# --------------------------------------------------------------------------
# Q88 — temporal (as-of) enrichment against the SCD2 dimension: every
# order picks up the status version in force at its order date
# (joins.py::scd2_asof_enrich — equi join + residual validity range;
# disjoint windows ⇒ at most one match, no post-join dedup), then a
# tiny rollup by in-force status. Composes q75's dimension build with
# the fact-side lookup a warehouse runs constantly.
# --------------------------------------------------------------------------
def q88_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.joins import scd2_asof_enrich
    from bloomy_etl_spark.sinks.layout import scd2_apply

    orders = _t(spark, sf_dir, "orders")
    obs = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("eff_ts"),
    )
    dim = scd2_apply(obs.filter(F.lit(False)), obs, ["custkey"], ["status"])
    facts = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        "o_totalprice",
    )
    return (
        scd2_asof_enrich(facts, dim, "custkey", "ts")
        .groupBy(F.col("status").alias("status_at_order"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .transform(_psort, "status_at_order")
    )


# --------------------------------------------------------------------------
# Q89 — semantic benchmark decontamination: corpus vectors whose max
# cosine against the benchmark set reaches τ are contaminated
# (similarity.py::semantic_decontam — benchmark folded in-row from one
# broadcast array row; corpus never shuffles). Per-label audit report;
# top_sim uses MAX (order-independent ⇒ exact cross-engine).
# --------------------------------------------------------------------------
def q89_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.similarity import semantic_decontam

    # fan_out: the per-row folded-cosine evaluation (interpreted
    # higher-order functions) dominates the 1-partition scan — spread it
    embs = _t(spark, sf_dir, "embeddings", fan_out=True)
    bench = embs.filter(F.col("vec_id") % 100 == 0)
    corpus = embs.filter(F.col("vec_id") % 100 != 0)
    flagged = semantic_decontam(corpus, bench, 0.25, keep_cols=("label",))
    return (
        flagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("contaminated").cast("long")).alias("n_contam"),
            F.round(F.max("max_sim"), 6).alias("top_sim"),
        )
        .transform(_psort, "label")
    )


# --------------------------------------------------------------------------
# Q90 — golden-record survivorship: each user's event observations
# collapse to one canonical profile under field-level rules — recency
# (max_by over a (ts, event_id) struct — deterministic tiebreak),
# frequency (mode with larger-value ties), extremum and counts. All
# non-mode rules ride ONE hash aggregate (survivorship.py); the mode
# adds a two-level count + max_by, no windows, no sorts.
# --------------------------------------------------------------------------
def q90_user_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.survivorship import golden_record

    ev = _t(spark, sf_dir, "events")
    out = golden_record(
        ev,
        ["user_id"],
        {
            "last_value": ("latest", "value", ("ts", "event_id")),
            "first_type": ("earliest", "event_type", ("ts", "event_id")),
            "top_type": ("mode", "event_type"),
            "peak_value": ("max", "value"),
            "n_obs": ("count", "event_id"),
            "n_types": ("count_distinct", "event_type"),
        },
    )
    return out.select(
        "user_id",
        F.round("last_value", 4).alias("last_value"),
        "first_type",
        "top_type",
        F.round("peak_value", 4).alias("peak_value"),
        "n_obs",
        "n_types",
    ).transform(_psort, "user_id")


# --------------------------------------------------------------------------
# Q91 — nearest-centroid label audit: per-label centroids (posexplode →
# per-dim mean, 6dp-quantized like k-means), then every vector
# classified to its max-cosine centroid IN-ROW from one broadcast
# centroid-array row (the q89 posture — corpus never shuffles before
# the confusion-matrix rollup). Ties break to the smaller label via a
# (sim, −label) struct max. Measures embedding/label coherence — the
# audit behind "are these labels worth training on".
# --------------------------------------------------------------------------
def q91_centroid_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.functions.vectors import dot, norm

    # fan_out: per-row in-row classification cost dominates (see q89)
    embs = _t(spark, sf_dir, "embeddings", fan_out=True)
    # r9 opt (guide §2.3/§2.4): per-dim centroid means in ONE label-keyed
    # hash-agg (64 avg slots per label) instead of posexplode → 64×-row
    # (label, dim) aggregate → second label aggregate to re-assemble the
    # array. Removes the d× row explosion ahead of the exchange and one
    # whole aggregation level; same null-free inputs, 6-dp-rounded means.
    # 64 explicit sums + ONE shared count (the vectors are null-free)
    # rather than 64 avg aggregates: avg would carry 128 buffer slots,
    # past spark.sql.codegen.maxFields (100), silently dropping the
    # aggregate out of whole-stage codegen. sum(cast double)/count is
    # Average's exact evaluation order, so the 6-dp means are unchanged.
    _D = 64  # embeddings fixture dimension (JL_IN)
    cent = (
        embs.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.col("embedding")[d].cast("double")).alias(f"__s{d}")
                for d in range(_D)
            ],
        )
        .select(
            F.col("label").alias("clabel"),
            F.array(*[
                F.round(F.col(f"__s{d}") / F.col("__n"), 6)
                for d in range(_D)
            ]).alias("cv"),
        )
        .withColumn("cn", norm(F.col("cv")))
    )
    crow = cent.agg(
        F.collect_list(F.struct("clabel", "cv", "cn")).alias("__cents")
    )
    vecs = embs.select(
        "vec_id", "label", F.col("embedding").alias("v")
    ).withColumn("vn", norm(F.col("v")))
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda s: F.struct(
                (dot(F.col("v"), s["cv"]) / (F.col("vn") * s["cn"])).alias(
                    "sim"
                ),
                (-s["clabel"]).alias("nl"),
            ),
        )
    )
    return (
        vecs.crossJoin(F.broadcast(crow))
        .select("label", (-best["nl"]).cast("int").alias("pred_label"))
        .groupBy(F.col("label").alias("true_label"), "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .transform(_psort, "true_label", "pred_label")
    )


# --------------------------------------------------------------------------
# Q92 — distributed sequential IDs: global row numbers in
# (acctbal, custkey) order via the two-pass range-sort + offset design
# (operators/ids.py) — the scalable replacement for the single-task
# ROW_NUMBER()-with-no-PARTITION window. The oracle IS that window;
# equality shows the two-pass ids equal the global rank.
# --------------------------------------------------------------------------
def q92_sequential_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.ids import assign_sequential_ids

    cust = _t(spark, sf_dir, "customer")
    out = assign_sequential_ids(cust, ["c_acctbal", "c_custkey"])
    return out.select("seq_id", "c_custkey", "c_acctbal").transform(
        _psort, "seq_id"
    )


# --------------------------------------------------------------------------
# Q93 — ranking-function pack: NTILE / PERCENT_RANK / CUME_DIST /
# DENSE_RANK over one per-segment window (completes the window-function
# family next to q11's RANK). percent_rank and cume_dist are exact
# rationals of rank and count — identical doubles in both engines under
# a total order.
# --------------------------------------------------------------------------
def q93_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.dense_rank().over(w).alias("drank"),
        )
        .transform(_psort, "c_mktsegment", "c_custkey")
    )


# --------------------------------------------------------------------------
# Q94 — pivot: daily event counts spread into one column per event
# type (explicit value list ⇒ deterministic schema; missing cells are
# true zeros). The oracle is the conditional-aggregation rewrite PIVOT
# desugars to.
# --------------------------------------------------------------------------
def q94_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = (
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("day")
    )
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        _t(spark, sf_dir, "events")
        .select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    ).transform(_psort, "day")


# --------------------------------------------------------------------------
# Q95 — multiset set operations: EXCEPT ALL / INTERSECT ALL on the
# per-user click vs view bags (q12 covers the DISTINCT variants; ALL
# keeps multiplicities — bag algebra, not set algebra). Aggregated to
# per-user counts so the output is bounded while every multiset row
# still feeds the hash gate.
# --------------------------------------------------------------------------
def q95_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    extra = (
        clicks.exceptAll(views)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_extra_clicks"))
    )
    common = (
        clicks.intersectAll(views)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        extra.join(common, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_extra_clicks", F.lit(0)).alias("n_extra_clicks"),
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
        )
        .transform(_psort, "user_id")
    )


# --------------------------------------------------------------------------
# Q96 — modern aggregate pack: COUNT_IF / BOOL_AND / BOOL_OR /
# MAX_BY / MIN_BY in one pass (arg-extremes use a (price, key) struct
# order so ties are deterministic; the oracle reads them off ranked
# windows).
# --------------------------------------------------------------------------
def q96_modern_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ord_struct = F.struct("o_totalprice", "o_orderkey")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_custkey") > 0).alias("all_pos_cust"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
            F.max_by("o_orderkey", ord_struct).alias("top_order"),
            F.min_by("o_orderkey", ord_struct).alias("bottom_order"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .transform(_psort, "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q97 — multi-source BFS reach: hop distances from seed parts over the
# bipartite part↔supplier graph (nodes integer-encoded 2·part /
# 2·supp+1). graph.py::bfs_hops iterates frontiers (per-round shuffle
# O(frontier ⋈ edges), early exit, checkpointed); distances are exact
# integers so the oracle is a recursive CTE with zero quantization.
# Summarized per hop level with a part/supplier split.
# --------------------------------------------------------------------------
def q97_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.graph import bfs_hops

    os_ = (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") * 2).alias("p"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = os_.select(F.col("p").alias("src"), F.col("s").alias("dst")).union(
        os_.select(F.col("s").alias("src"), F.col("p").alias("dst"))
    )
    sources = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 500 == 0)
        .select((F.col("p_partkey") * 2).alias("node"))
    )
    d = bfs_hops(edges, sources, max_hops=3)
    return (
        d.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.count_if(F.col("node") % 2 == 0).alias("n_parts"),
            F.count_if(F.col("node") % 2 == 1).alias("n_suppliers"),
        )
        .transform(_psort, "dist")
    )


# --------------------------------------------------------------------------
# Q98 — one-pass OLS trend fit: per-event-type regression of value on
# day (operators/regression.py — five sufficient statistics in ONE
# hash aggregate, closed-form slope/intercept/R², no iteration and no
# transcendentals, so the oracle replays the identical polynomial
# arithmetic).
# --------------------------------------------------------------------------
def q98_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.regression import linreg_by_group

    day = (
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("day")
    )
    ev = _t(spark, sf_dir, "events").select("event_type", day, "value")
    return linreg_by_group(ev, ["event_type"], "day", "value").transform(
        _psort, "event_type"
    )


# --------------------------------------------------------------------------
# Q99 — keyed pseudonymization release (operators/privacy.py): customer
# and order ids are replaced by deterministic keyed tokens BEFORE the
# join, and the whole revenue rollup runs in token space — proving the
# released tables keep referential integrity without real ids. Pure
# per-row JVM projection on both sides (no UDF, no extra shuffle); the
# token fn is engine-portable md5, so the oracle replays it verbatim.
# --------------------------------------------------------------------------
_Q99_KEY = "q99-release-key"


def q99_pseudonymized_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.privacy import pseudonymize

    cust = pseudonymize(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        ["c_custkey"], _Q99_KEY,
    )
    orders = pseudonymize(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        ["o_custkey"], _Q99_KEY,
    )
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .transform(_psort, "c_mktsegment")
    )


# --------------------------------------------------------------------------
# Q100 — mergeable histogram quantiles under the hash gate
# (operators/sketches.py::hist_*): two disjoint order slices are
# sketched independently, merged (element-wise — exactly the state the
# one-shot build produces), and per-priority p25/p50/p90 estimates are
# read off the merged state. The oracle replays the identical binning,
# cumulative walk, landing-bin interpolation, and [vmin, vmax] clamp in
# SQL — every arithmetic step is the same IEEE double op in both
# engines, so the estimates hash-match exactly. (lo=0, hi=600000 covers
# all fixture totalprices: tails stay 0 and the in-range path is what's
# gated; the tail clamps are unit-tested in tests/test_sketches.py.)
# --------------------------------------------------------------------------
def q100_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bloomy_etl_spark.operators.sketches import (
        hist_build,
        hist_merge,
        hist_quantile,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("v"),
    )
    # r9 opt (guide §2.4/§6): the two disjoint half-corpus sketches come
    # from ONE scan — the slice id is a column, built into the sketch
    # key and dropped before the merge, so hist_merge still folds two
    # independently-built sketch rows per group (the mergeability the
    # query gates) while the orders table is read once instead of twice.
    sliced = hist_build(
        o.withColumn("__slice", F.pmod(F.col("o_orderkey"), F.lit(2))),
        ["__slice", "o_orderpriority"], "v", 0.0, 600000.0, n_bins=60,
    ).drop("__slice")
    est = hist_quantile(hist_merge(sliced), [0.25, 0.5, 0.9],
                        0.0, 600000.0)
    return est.select(
        "o_orderpriority", "q", F.round("est", 4).alias("est")
    ).transform(_psort, "o_orderpriority", "q")


def q114_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval sliding window — the RANGE frame, which ROWS frames
    cannot express over irregular event spacing: for every event, the
    count and quantized value sum of the SAME USER's events in the
    trailing hour (``RANGE BETWEEN 3600·10⁶ µs PRECEDING AND CURRENT
    ROW`` over integer epoch-microseconds). Values enter the frame sum
    as ``floor(value·10⁴)`` integers, so the windowed sum is exact under
    any in-frame accumulation order.

    Scale: one shuffle keyed by user (the window partition); frames are
    evaluated with a sliding two-pointer pass per partition — no
    self-join, no per-event range scan."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts")).alias("eus"),
        F.floor(F.col("value") * 10000).cast("long").alias("v_e4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("eus").asc())
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "event_id", "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.sum("v_e4").over(w).alias("sum_v_e4"),
        )
        .transform(_psort, "event_id")
    )


def q115_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary (non-hierarchical) GROUPING SETS — the surface CUBE and
    ROLLUP (q83/q13) cannot express: exactly the four sets
    ((priority, status), (priority), (status), ()) over orders, with
    GROUPING_ID disambiguating the NULL-vs-aggregated cells. One
    shuffle: Spark expands the sets map-side and aggregates once."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"],
             ["o_orderstatus"], []],
            "o_orderpriority", "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("__ALL__")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("__ALL__")).alias("status"),
            "gid", "n_orders", "total",
        )
        .transform(_psort, "gid", "priority", "status")
    )


def q116_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-day event-type count matrix (q94's
    pivot output) back to long (day, event_type, n) — the
    wide-to-long reshape, with zero-cells kept (an observed day × known
    type grid). In-row expansion: unpivot is a generator over the value
    columns, no extra shuffle beyond the pivot aggregate itself."""
    day = (
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .alias("day")
    )
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        _t(spark, sf_dir, "events")
        .select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    wide = piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )
    return (
        wide.unpivot(
            ids=["day"], values=types,
            variableColumnName="event_type", valueColumnName="n",
        )
        .transform(_psort, "day", "event_type")
    )


def q117_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/scale per event type: exact MEDIAN and MAD
    (median absolute deviation) — the outlier-resistant audit pair, and
    a NESTED exact-median mechanism (median of |v − median|) no single
    aggregate expresses. Values enter as FLOOR(value·100) integers so
    even-count median interpolation ((a+b)/2 vs a+(b−a)/2) is exact and
    identical in both engines. Two aggregates + one broadcast join of
    the per-type medians (a handful of rows at any scale)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 100).cast("double").alias("v")
    )
    med = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.median("v").alias("med_e2")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("v") - F.col("med_e2"))
    )
    return (
        dev.groupBy("event_type", "n", "med_e2")
        .agg(F.median("ad").alias("mad_e2"))
        .transform(_psort, "event_type")
    )


def q119_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable register-level HyperLogLog (sketches.hll_registers):
    per-event-type distinct-user registers over the engine-portable md5
    hash, PLUS the corpus-wide sketch obtained by MERGING the per-type
    register tables (bucket-wise max — the mergeability that makes HLL
    a rollup artifact). Registers are pure integers, so build AND merge
    are driver-hash-gated exactly; the float estimator is the
    unit-verified tier (tests/test_sketches.py)."""
    from bloomy_etl_spark.operators import sketches as SK

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    regs = SK.hll_registers(ev, ["event_type"], "user_id", m=64)
    merged = SK.hll_registers_merge(regs, []).withColumn(
        "event_type", F.lit("ALL")
    )
    return (
        regs.unionByName(merged.select("event_type", "bucket", "r"))
        .transform(_psort, "event_type", "bucket")
    )


def q134_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics (checks.skew_profile): the top-10 hottest
    user keys in events with exact quantized shares plus the HHI
    concentration index — the pre-flight audit before keying a 100 TB
    shuffle on a column. One key-grain hash-agg + a 4-value global
    reduce + a top-k TakeOrdered; the profiler never global-sorts the
    key frame."""
    ev = _t(spark, sf_dir, "events")
    return checks.skew_profile(ev, "user_id", topk=10).transform(
        _psort, "rank"
    )


def q135_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram audit (checks.calibration_bins): bin the
    exact integer quality proxy floor(10⁶·distinct/total tokens) into
    10 fixed-width bins and compare per-bin mean score vs the empirical
    lang='en' rate — the calibration check behind every score-threshold
    gate (q120/q130). One ≤10-key hash-agg, all int64."""
    from bloomy_etl_spark.functions import text as TX

    docs = _t(spark, sf_dir, "documents", fan_out=True)
    ws = TX.tokens(F.col("text"))
    num = F.lit(1_000_000) * F.size(F.array_distinct(ws))
    den = F.size(ws)
    scored = docs.select(
        ((num - num % den) / den).cast("long").alias("score_e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return checks.calibration_bins(scored, "score_e6", "is_en").transform(
        _psort, "bin"
    )


_GDPR_MEMO: dict[tuple, str] = {}


def _cleanup_gdpr_dirs() -> None:
    import shutil

    for d in _GDPR_MEMO.values():
        shutil.rmtree(d, ignore_errors=True)
    _GDPR_MEMO.clear()


import atexit  # noqa: E402 — registration belongs next to the hook

atexit.register(_cleanup_gdpr_dirs)


def q131_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten, hash-gated END TO END
    (sinks.layout.propagate_deletes + apply_tombstones — reference has
    no counterpart; this is the deletion flow a real 100 TB corpus
    needs): copy events into a date-partitioned scratch table plus a
    derived per-user store, delete the deterministic id set
    ``user_id % 53 == 7`` with tombstone logging, propagate the
    tombstones into the derived store, and report three audited parts:

    - ``events``: surviving per-day row counts + exact quantized value
      sums read back FROM THE REWRITTEN FILES (proves the deletion
      actually reached disk, including fully-emptied partitions);
    - ``tomb``: per-day tombstoned (id, day) audit rows;
    - ``derived``: surviving user rows vs rows removed by the
      tombstone replay.

    The oracle replays the whole flow as plain anti-join aggregates.
    Scale: probe + rewrite touch only the deleted ids' partitions; the
    id set broadcasts; the scratch build is memoized per (process,
    fixture mtime) so repeated driver calls read stable files."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.sinks.layout import (
        apply_tombstones,
        propagate_deletes,
        write_date_partitioned,
    )

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), sf_dir, os.stat(src).st_mtime_ns)
    base = _GDPR_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_gdpr",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        tbl, tomb, store = (os.path.join(base, d)
                            for d in ("events", "tomb", "store"))
        ev = _t(spark, sf_dir, "events")
        write_date_partitioned(ev, tbl)
        (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .write.mode("overwrite").parquet(store)
        )
        ids = (
            ev.select("user_id")
            .where(F.col("user_id") % 53 == 7)
            .distinct()
        )
        propagate_deletes(spark, tbl, ids, "user_id", tombstone_dir=tomb,
                          requested_at="2026-01-01")
        removed = apply_tombstones(spark, store, tomb, "user_id")
        with open(os.path.join(base, "_REMOVED"), "w") as f:
            f.write(str(removed))
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _GDPR_MEMO[key] = base
    tbl, tomb, store = (os.path.join(base, d)
                        for d in ("events", "tomb", "store"))
    with open(os.path.join(base, "_REMOVED")) as f:
        removed = int(f.read())
    part_events = (
        spark.read.parquet(tbl)
        .groupBy(F.col("p_date").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("m"),
        )
        .select(F.lit("events").alias("part"), "day", "n", "m")
    )
    part_tomb = (
        spark.read.parquet(tomb)
        .groupBy(F.col("p_date").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("tomb").alias("part"), "day", "n",
                F.lit(0).cast("long").alias("m"))
    )
    part_derived = (
        spark.read.parquet(store)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("derived").alias("part"), F.lit("ALL").alias("day"),
            "n", F.lit(removed).cast("long").alias("m"),
        )
    )
    return (
        part_events.unionByName(part_tomb).unionByName(part_derived)
        .transform(_psort, "part", "day")
    )


_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def funnel_stages(ev: DataFrame, stages: list[str]) -> DataFrame:
    """Per-user furthest funnel stage reached (0 = none): collect each
    user's events into ONE sorted in-row array and walk it with a
    single ``aggregate`` fold advancing a (stage, last-µs) accumulator
    on strict time increase. Input columns: ``user_id``, ``eus``
    (epoch µs), ``event_id``, ``event_type``. One user-keyed shuffle;
    the array is bounded by per-actor activity (q84's bounded-actor
    assumption)."""
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("eus", "event_id", "event_type"))
        ).alias("seq")
    )
    acc0 = F.struct(
        F.lit(0).alias("s"), F.lit(-1).cast("long").alias("t")
    )
    return seq.select(
        "user_id",
        F.aggregate(F.col("seq"), acc0, funnel_step(stages))["s"]
        .alias("stage"),
    )


def funnel_step(stages: list[str]):
    """The funnel fold's transition function over a (s=stage, t=last-µs)
    struct accumulator — shared by the batch operator above and the
    streaming continuation fold (the accumulator composes exactly
    across ordered batches: stepping batch B from A's final state ≡
    stepping A∥B)."""

    def _step(acc, e):
        out = None
        for k, st in enumerate(stages, start=1):
            cond = (
                (acc["s"] == k - 1)
                & (e["event_type"] == st)
                & (e["eus"] > acc["t"])
            )
            nxt = F.struct(F.lit(k).alias("s"), e["eus"].alias("t"))
            out = F.when(cond, nxt) if out is None else out.when(cond, nxt)
        return out.otherwise(acc)

    return _step


def q140_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → view → click → purchase,
    each stage strictly AFTER the previous one in event time): users
    reaching each stage, plus exact integer conversion rates from the
    funnel top and from the previous stage. The sequential-pattern
    primitive clickstream analytics runs everywhere; the reference's
    event detector (core/quality.py:105-181) is the fixed-window
    cousin.

    Shape: ONE user-keyed shuffle — each user's events collect into a
    sorted in-row array (bounded by per-actor activity, the same
    bounded-actor assumption as q84's day sets) and a single
    ``aggregate`` fold walks it once, advancing a (stage, last-µs)
    accumulator on strict time increase. Equal-timestamp ties cannot
    double-advance (strict >), so the fold is order-independent within
    a tie and replays exactly as the oracle's MIN-after-MIN CTE chain.
    The stage histogram is ≤ 5 rows; everything after it is literal-
    bounded (4-row theta join + window).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        "event_type",
    )
    per_user = funnel_stages(ev, _FUNNEL_STAGES)
    hist = per_user.groupBy("stage").agg(F.count(F.lit(1)).alias("n"))
    stage_lit = spark.createDataFrame(
        [(k, s) for k, s in enumerate(_FUNNEL_STAGES, start=1)],
        "stage int, stage_name string",
    )
    reached = (
        stage_lit.join(
            F.broadcast(hist.withColumnRenamed("stage", "h_stage")),
            F.col("h_stage") >= F.col("stage"),
            "left",
        )
        .groupBy("stage", "stage_name")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_users"))
    )
    w = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    top = F.first("n_users").over(w)
    prev = F.lag("n_users").over(Window.orderBy("stage"))

    def _conv(num_col, den):
        num = F.lit(1_000_000) * num_col
        return ((num - num % den) / den).cast("long")

    return (
        reached.withColumn(
            "conv_top_e6",
            F.when(top > 0, _conv(F.col("n_users"), top)).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .withColumn(
            "conv_prev_e6",
            F.when(F.col("stage") == 1, F.lit(1_000_000).cast("long"))
            .when(prev > 0, _conv(F.col("n_users"), prev))
            .otherwise(F.lit(0).cast("long")),
        )
        .transform(_psort, "stage")
    )


def q141_triangle_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation on the STRONG co-purchase graph
    (graph.triangle_counts): parts that co-occur in ≥ 2 distinct
    orders form an edge; degree-ordered wedge counting finds every
    triangle exactly once at its κ-minimal vertex. Returns the top-20
    participating parts (ties to the smaller key) plus a global
    ``part_key = -1`` total row — the community-density signal next to
    q82's centrality and q42's connectivity.

    The support-≥2 gate is load-bearing at scale: the RAW co-purchase
    graph is near-complete over the part space (measured 1.2M edges at
    sf0.1 → 41M wedges), while the strong graph keeps ~3.5k edges; the
    same thresholding any real co-occurrence analysis applies."""
    from bloomy_etl_spark.operators.graph import basket_pairs, triangle_counts

    # r9: in-row basket pair generation (graph.basket_pairs) replaces
    # the op ⋈ op self-join — one exchange fewer, nothing order-grain
    # broadcast or sort-merged (guide §2.4).
    edges = (
        basket_pairs(
            _t(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("o"),
                    F.col("l_partkey").alias("p")),
            key="o", item="p",
        )
        .filter(F.col("w") >= 2)
        .drop("w")
    )
    part = triangle_counts(edges)
    top = (
        part.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("n_triangles").desc(),
                               F.col("node").asc())
            ),
        )
        .filter(F.col("rn") <= 20)
        .select(F.col("node").cast("long").alias("part_key"),
                "n_triangles")
    )
    total = part.agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / 3)
        .cast("long")
        .alias("n_triangles")
    ).select(F.lit(-1).cast("long").alias("part_key"), "n_triangles")
    return top.unionByName(total).transform(_psort, "part_key")


def q142_ewma_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA load baseline (timeseries.ewma_last, α = 1/4)
    over the event values in exact integer v_e4 arithmetic — the
    stream-smoothing signal, order-sensitive by definition, computed
    as one user-keyed sorted-array fold (the q140 shape) that a
    sequential engine replays bit-identically via list_reduce."""
    from bloomy_etl_spark.operators.timeseries import ewma_last

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    return ewma_last(ev, alpha_den=4).transform(_psort, "user_id")


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """2-D Pareto skyline (maximize both dims): every row not dominated
    by another row that is ≥ in both dimensions and strictly greater in
    at least one. Duplicates of a skyline point are all skyline (no
    strict improvement exists). The classic multi-criteria OLAP
    operator (BÖRZSÖNYI et al.'s SKYLINE OF), absent from SQL engines.

    Shape — the window never touches corpus grain: one x-keyed hash-agg
    reduces the corpus to the DISTINCT-x frame (map-side combinable),
    a prefix-max window over that frame finds the x-values whose best y
    beats every strictly-larger x (survivor ⟺ ymax(x) > max ymax over
    x' > x, and a row survives ⟺ its y equals its x's ymax), and the
    O(log n)-expected skyline x-table broadcasts back onto the corpus.
    The single-partition window is bounded by the x-DOMAIN (distinct
    values), not rows — for an unbounded domain, two-phase it like the
    q129 prefix sum. All decisions are exact comparisons on the input
    columns (integers in the declared q143 form)."""
    gx = df.groupBy(x).agg(F.max(y).alias("__ymax"))
    w = Window.orderBy(F.col(x).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_x = (
        gx.withColumn("__pm", F.max("__ymax").over(w))
        .filter(F.col("__pm").isNull() | (F.col("__ymax") > F.col("__pm")))
        .drop("__pm")
    )
    return (
        df.join(F.broadcast(sky_x), x)
        .filter(F.col(y) == F.col("__ymax"))
        .drop("__ymax")
    )


def q143_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal documents by (token count ↑, type-token ratio ↑)
    — the two naturally conflicting document virtues (long documents
    repeat more), so the skyline is the "best of both" frontier a
    curation pass reads instead of a single blended score. Both
    dimensions are exact integers computed in-row (no extra shuffle
    before the skyline's distinct-x agg)."""
    from bloomy_etl_spark.functions import text as T

    docs = _t(spark, sf_dir, "documents", fan_out=True)
    toks = T.tokens(F.col("text"))
    num = F.lit(1_000_000) * F.size(F.array_distinct(toks))
    # r9: pin the scored frame — skyline_2d consumes it twice (the
    # distinct-x aggregate AND the broadcast-probe side), and without
    # the pin each consumer re-ran the tokenize + distinct-fold over the
    # full text from its own parquet scan (plan before: 2 scans). The
    # pinned proxy is 3 int64 columns per document (guide §2.4/§8:
    # tokenize once, decide on the narrow frame).
    scored = pin(
        docs.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            ((num - num % F.size(toks)) / F.size(toks))
            .cast("long")
            .alias("ttr_e6"),
        ),
        eager=False,
    )
    return skyline_2d(scored, "n_tokens", "ttr_e6").transform(
        _psort, "doc_id"
    )


_STREAM_MEMO: dict[tuple, str] = {}


def _cleanup_stream_dirs() -> None:
    import shutil

    for d in _STREAM_MEMO.values():
        shutil.rmtree(d, ignore_errors=True)
    _STREAM_MEMO.clear()


atexit.register(_cleanup_stream_dirs)


def q144_streaming_ewma_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first STREAMING flow under the driver hash gate (the q131
    capstone pattern applied to Structured Streaming): replay the
    events fixture as three time-ordered micro-batches through
    ``streaming_ewma_ingest`` (foreachBatch continuation folds over a
    durable per-batch delta store) and return the final per-user state.
    The oracle is the PLAIN BATCH list_reduce replay (q142's SQL
    shape) — the hash match IS the stream ≡ batch bit-identity
    contract, driver-checked end-to-end rather than only unit-pinned.

    Scratch build (replay slices → availableNow query → state store) is
    memoized per (session, fixture mtime) like q131's GDPR build, so
    repeated driver calls read stable files; dirs are cleaned at exit.
    """
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.streaming.ingest import (
        read_ewma_state,
        streaming_ewma_ingest,
    )
    from bloomy_etl_spark.streaming.sources import replay_dir_ordered

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        replay = replay_dir_ordered(
            spark, sf_dir, os.path.join(base, "replay"), n_files=3
        )
        schema = spark.read.parquet(replay).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
            .select(
                "user_id",
                F.unix_micros("ts").alias("eus"),
                "event_id",
                F.floor(F.col("value") * 10000).cast("long").alias("v"),
            )
        )
        q = streaming_ewma_ingest(
            stream,
            os.path.join(base, "state"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q144 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    return read_ewma_state(spark, os.path.join(base, "state")).transform(
        _psort, "user_id"
    )


def q145_supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier communities by synchronous label propagation
    (graph.label_propagation, 3 rounds, min-label ties) over the
    STRONG co-purchase graph — suppliers that co-fulfil ≥ 2 distinct
    orders share an edge (q141's support gate on the q82 supplier
    graph).  Completes the graph-analytics family: q42 connectivity,
    q82 centrality, q97 reachability, q141 local density, q145
    community structure.  All label decisions are exact integer
    majority votes, replayed by the oracle as one unrolled
    MATERIALIZED CTE per round."""
    from bloomy_etl_spark.operators.graph import basket_pairs, label_propagation

    # r9: in-row basket pairs (graph.basket_pairs) replace the self-join
    # edge build — see q141.
    edges = (
        basket_pairs(
            _t(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("o"),
                    F.col("l_suppkey").alias("s")),
            key="o", item="s",
        )
        .filter(F.col("w") >= 2)
        .drop("w")
    )
    return (
        label_propagation(edges, rounds=3)
        .select(F.col("node").cast("long").alias("supp_key"),
                F.col("label").cast("long").alias("community"))
        .transform(_psort, "supp_key")
    )


def q146_mg_frequent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact φ = 1/150 frequent users via two-phase Misra-Gries
    (sketches.frequent_items_exact): per-partition bounded-state MG
    summaries prune the user domain to a provable candidate superset,
    then an exact broadcast-pruned recount keeps ``n * 150 >= N``.
    The oracle is the PLAIN full-domain GROUP BY ... HAVING — the hash
    match proves the bounded-state pruning lossless (the q113
    pattern). The deterministic frequent-set counterpart to q65's
    probabilistic CMS point estimates: at 100 TB the full-domain agg
    shuffles a row per distinct key, MG shuffles O(partitions ×
    capacity)."""
    from bloomy_etl_spark.operators.sketches import frequent_items_exact

    ev = _t(spark, sf_dir, "events").select("user_id")
    return (
        frequent_items_exact(ev, "user_id", k=150, capacity=256)
        .withColumnRenamed("n_items", "n_events")
        .transform(_psort, "user_id")
    )


def q147_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: count non-overlapping occurrences of the
    row pattern ``view → click → purchase`` (no purchase in between)
    in each user's time-ordered event stream, by encoding the stream
    as a code string (one char per event, initials are distinct) and
    scanning it with ``v[^p]*c[^p]*p`` — leftmost-first regex
    semantics ARE the SQL:2016 row-pattern scan (skip past last row of
    match), shared by Java regex and RE2 for this pattern class.
    Complements q140's stage-fold funnel (earliest single traversal)
    with repeated-match counting, the piece of MATCH_RECOGNIZE an
    event engine needs most. One user-keyed shuffle builds the code
    strings (sorted-struct fold, the q142 shape); the scan is
    per-row JVM regex, no second shuffle."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("eus"),
            F.col("event_id").alias("eid"),
            F.substring("event_type", 1, 1).alias("code"),
        ).alias("s"),
    )
    seq = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list("s")),
                        lambda r: r["code"]),
            "",
        ).alias("seq"),
    )
    return (
        seq.select(
            "user_id",
            "n_events",
            F.size(F.regexp_extract_all(
                F.col("seq"), F.lit(r"v[^p]*c[^p]*p"), F.lit(0)
            )).cast("long").alias("n_conversions"),
        )
        .filter(F.col("n_conversions") >= 1)
        .transform(_psort, "user_id")
    )


def q148_streaming_cluster_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-cluster MAINTENANCE under the driver hash gate
    (the q144 pattern applied to graph state): the exact n-gram
    Jaccard near-dup pairs (q42's edge set) are replayed as three
    hash-sliced micro-batches through ``streaming_cc_ingest`` — each
    batch updates a durable (node, min-label) snapshot by running
    converged components over NEW edges ∪ the prior snapshot as star
    edges — and the final state is hashed against the one-shot
    recursive-CTE oracle.  Connected components is confluent, so the
    incremental answer equals the batch answer for ANY arrival order;
    the hash match IS that soundness contract, end-to-end.  This is
    how a 100 TB corpus keeps its duplicate clusters current as dumps
    arrive, without re-reading prior pair history (per-batch cost is
    bounded by the batch graph + one star per live component)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.operators.dedup import ngram_jaccard_pairs
    from bloomy_etl_spark.streaming.ingest import (
        read_cc_state,
        streaming_cc_ingest,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    key = (id(spark), "q148", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        docs = _t(spark, sf_dir, "documents", fan_out=True)
        pairs = ngram_jaccard_pairs(docs).select("i", "j")
        replay = os.path.join(base, "replay")
        # hash-sliced batches: arrival order is provably irrelevant
        # (confluence), so no mtime choreography is needed here
        for bi in range(3):
            pairs.filter(
                F.pmod(F.xxhash64("i", "j"), F.lit(3)) == bi
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(replay, f"b{bi}")
            )
        stream = (
            spark.readStream.schema("i long, j long")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(replay, "b*"))
        )
        q = streaming_cc_ingest(
            stream,
            os.path.join(base, "state"),
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q148 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    return (
        read_cc_state(spark, os.path.join(base, "state"))
        .select(F.col("node").cast("long").alias("doc_id"),
                F.col("label").cast("long").alias("cluster"))
        .transform(_psort, "doc_id")
    )


def q149_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM burst detection (timeseries.cusum_alerts,
    drift 70.0, threshold 300.0 in v_e4 units) — Page's sequential
    change detector over the event values: the monitoring triad's
    third leg (q142 EWMA smooths the level, q86 rolling-z flags point
    outliers, CUSUM detects SUSTAINED shifts with bounded delay).
    Exact packed-int64 fold per user (one shuffle, q142's shape); a
    sequential engine replays the identical alert/reset walk via
    list_reduce."""
    from bloomy_etl_spark.operators.timeseries import cusum_alerts

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    return cusum_alerts(
        ev, drift=700_000, threshold=3_000_000
    ).transform(_psort, "user_id")


def q150_zorder_zonemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout rewrite + the zone maps it earns
    (zorder.zorder_files / zone_maps): events are laid out along the
    Morton curve of (user bucket, day bucket), cut into 500-row
    files, and the file-grain min/max skipping index is returned with
    a `scanned` audit flag for the rectangle x∈[32,47] × y∈[8,15] —
    the OPTIMIZE-ZORDER capability a 100 TB lake runs so that
    two-dimensional predicates prune files instead of reading the
    world. The global rank is the exact two-phase distributed scan
    (q129's shape) — no single-task window; the z-value is pure
    codegen bit arithmetic the oracle replays as the same shift/mask
    sum."""
    from bloomy_etl_spark.operators.zorder import zone_maps, zorder_files

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("xb"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"),
                       F.lit("2024-01-01").cast("date")),
            F.lit(256),
        ).cast("long").alias("yb"),
    )
    laid = zorder_files(ev, "xb", "yb", "event_id",
                        bits=8, rows_per_file=500)
    return (
        zone_maps(laid, "xb", "yb")
        .withColumn(
            "scanned",
            (
                (F.col("x_min") <= 47) & (F.col("x_max") >= 32)
                & (F.col("y_min") <= 15) & (F.col("y_max") >= 8)
            ).cast("long"),
        )
        .transform(_psort, "file_id")
    )


def q151_vote_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote label aggregation (labels.majority_vote): each
    user's events vote for a behavioural label (their event types),
    and the consensus step emits the winning label, exact agreement
    share in millionths, and a 40%-share abstain flag — the
    annotation-aggregation operator every preference / classification
    dataset build runs before training. One map-side-combinable
    hash-agg to (item,label) counts, then a window over the bounded
    label frame; ties break to the smallest label in both engines."""
    from bloomy_etl_spark.operators.labels import majority_vote

    votes = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("item"),
        F.col("event_type").alias("label"),
    )
    return majority_vote(votes, min_share_e6=400_000).transform(
        _psort, "item"
    )


def q152_state_run_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history COMPACTION (history.scd2_compact): the per-user
    event-type log collapses into half-open [valid_from, valid_to)
    validity runs with version numbers — the backfill/bootstrap path
    that rebuilds a dimension from its raw log in one pass, the
    ground truth q75's incremental scd2_apply upserts must converge
    to. Gaps-and-islands with all three passes on the SAME user
    partitioning — Catalyst plans one exchange (plan-pinned)."""
    from bloomy_etl_spark.operators.history import scd2_compact

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        F.col("event_type").alias("state"),
    )
    return scd2_compact(ev).transform(_psort, "user_id", "version")


def q153_streaming_cusum_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM monitoring under the driver hash gate (the
    q144 pattern applied to q149): the events fixture replays as
    three time-ordered micro-batches through
    ``streaming_cusum_ingest`` — continuation folds seeded from each
    key's durable packed state — and the final per-user (n_obs,
    n_alerts, resid) is hashed against the one-shot batch oracle.
    The packed recurrence composes exactly across batches, so the
    hash match IS the stream ≡ batch bit-identity contract for the
    alerting path, end-to-end."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.streaming.ingest import (
        read_cusum_state,
        streaming_cusum_ingest,
    )
    from bloomy_etl_spark.streaming.sources import replay_dir_ordered

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), "q153", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        replay = replay_dir_ordered(
            spark, sf_dir, os.path.join(base, "replay"), n_files=3
        )
        schema = spark.read.parquet(replay).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
            .select(
                "user_id",
                F.unix_micros("ts").alias("eus"),
                "event_id",
                F.floor(F.col("value") * 10000).cast("long").alias("v"),
            )
        )
        q = streaming_cusum_ingest(
            stream,
            os.path.join(base, "state"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q153 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    return read_cusum_state(spark, os.path.join(base, "state")).transform(
        _psort, "user_id"
    )


def q154_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry brand strengths (preference.bradley_terry, 3 MM
    rounds, all-integer e6 arithmetic): within each order, a brand
    "beats" every other brand it out-ships (order-grain quantity
    duels), and the MM fit turns ~12 duels/order into one calibrated
    strength per brand — the pairwise-preference model behind RLHF
    reward data and arena leaderboards.  The duel log is reduced by
    two map-side-combinable aggs before any iteration; rounds run on
    the 300-row pair table.  The oracle unrolls the identical integer
    rounds — floor divisions on non-negative operands, so both
    engines walk the same sequence exactly (no q82-style float
    rounding anywhere)."""
    from bloomy_etl_spark.operators.preference import bradley_terry

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), "l_partkey", "l_quantity"
    )
    pt = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    lb = (
        li.join(pt, "l_partkey")
        .groupBy("ok", "brand")
        .agg(F.sum("l_quantity").alias("q"))
    )
    # r9 opt (guide §2.4, the basket_pairs shape): duels generate IN-ROW
    # from per-order baskets instead of the lb ⋈ lb self-join — one
    # order-keyed hash-agg replaces the join's two order-grain exchange
    # sides. Brands are distinct within a basket by lb's grouping; a
    # strict q comparison emits exactly one (winner, loser) row per
    # unordered pair with distinct q — the identical duel multiset.
    baskets = lb.groupBy("ok").agg(
        F.collect_list(F.struct("brand", "q")).alias("__bs")
    )
    ps = F.col("__bs")
    pair_structs = F.flatten(
        F.transform(
            ps,
            lambda x, i: F.transform(
                F.slice(ps, i + 2, F.size(ps)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    up = F.col("__p.a.q") > F.col("__p.b.q")
    duels = (
        baskets.select(F.explode(pair_structs).alias("__p"))
        .filter(F.col("__p.a.q") != F.col("__p.b.q"))
        .select(
            F.when(up, F.col("__p.a.brand"))
            .otherwise(F.col("__p.b.brand")).alias("winner"),
            F.when(up, F.col("__p.b.brand"))
            .otherwise(F.col("__p.a.brand")).alias("loser"),
        )
    )
    return bradley_terry(duels, rounds=3).transform(_psort, "item")


def q155_supplier_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the strong co-purchase supplier graph (graph.k_core,
    6 synchronous peel rounds over q141's support-≥2 edge set) — the
    COHESION backbone: suppliers that stay connected to ≥ 3 strong
    partners even after the cascade removes everyone who doesn't.
    Every decision is an integer degree comparison; the oracle unrolls
    the same rounds as MATERIALIZED CTEs, and the `converged` flag
    certifies the peel reached its fixed point (the result IS the
    3-core, not an intermediate state)."""
    from bloomy_etl_spark.operators.graph import basket_pairs, k_core

    # r9: in-row basket pairs (graph.basket_pairs) replace the self-join
    # edge build — see q141.
    edges = (
        basket_pairs(
            _t(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("o"),
                    F.col("l_suppkey").alias("s")),
            key="o", item="s",
        )
        .filter(F.col("w") >= 2)
        .drop("w")
    )
    return (
        k_core(edges, k=3, rounds=6)
        .select(F.col("node").cast("long").alias("supp_key"),
                "degree", "converged")
        .transform(_psort, "supp_key")
    )


def q156_streaming_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 dimension maintenance under the driver hash
    gate (the q144/q153 pattern applied to q152): the events fixture
    replays as three time-ordered micro-batches through
    ``streaming_scd2_ingest`` — per-batch self-compaction merged
    against each key's open run — and the reader's interval table is
    hashed against the one-shot batch compaction oracle.  Runs that
    SPAN batch boundaries are the hard case (independent per-batch
    compaction splits them); the hash match proves the open-run merge
    heals every seam."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.streaming.ingest import (
        read_scd2_state,
        streaming_scd2_ingest,
    )
    from bloomy_etl_spark.streaming.sources import replay_dir_ordered

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), "q156", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        replay = replay_dir_ordered(
            spark, sf_dir, os.path.join(base, "replay"), n_files=3
        )
        schema = spark.read.parquet(replay).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
            .select(
                "user_id",
                F.unix_micros("ts").alias("eus"),
                "event_id",
                F.col("event_type").alias("state"),
            )
        )
        q = streaming_scd2_ingest(
            stream,
            os.path.join(base, "state"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q156 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    return read_scd2_state(spark, os.path.join(base, "state")).transform(
        _psort, "user_id", "version"
    )


def q158_streaming_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live Bradley-Terry leaderboard under the driver hash gate: the
    q154 brand-duel log replays as three hash-sliced micro-batches
    through ``streaming_duel_ingest`` (directional-count deltas —
    additive, hence CONFLUENT: any arrival order), and the read-side
    re-fit over the merged counts is hashed against q154's one-shot
    oracle.  The contract this gates: a leaderboard maintained
    incrementally forever equals the batch fit over all history, with
    per-batch cost that never grows with that history."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.operators.preference import (
        bradley_terry_from_counts,
    )
    from bloomy_etl_spark.streaming.ingest import (
        read_duel_counts,
        streaming_duel_ingest,
    )

    src = os.path.join(sf_dir, "lineitem.parquet")
    key = (id(spark), "q158", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        li = _t(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ok"), "l_partkey", "l_quantity"
        )
        pt = _t(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("l_partkey"),
            F.col("p_brand").alias("brand"),
        )
        lb = (
            li.join(pt, "l_partkey")
            .groupBy("ok", "brand")
            .agg(F.sum("l_quantity").alias("q"))
        )
        a, b = lb.alias("a"), lb.alias("b")
        duels = a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") != F.col("b.brand"))
            & (F.col("a.q") > F.col("b.q")),
        ).select(
            F.col("a.brand").alias("winner"),
            F.col("b.brand").alias("loser"),
            F.col("a.ok").alias("ok"),
        )
        replay = os.path.join(base, "replay")
        # hash-sliced batches: counts are additive, arrival order is
        # provably irrelevant (the q148 confluence argument)
        for bi in range(3):
            duels.filter(
                F.pmod(F.xxhash64("winner", "loser", "ok"), F.lit(3)) == bi
            ).select("winner", "loser").coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(replay, f"b{bi}"))
        stream = (
            spark.readStream.schema("winner string, loser string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(replay, "b*"))
        )
        q = streaming_duel_ingest(
            stream,
            os.path.join(base, "state"),
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q158 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    counts = read_duel_counts(spark, os.path.join(base, "state"))
    return bradley_terry_from_counts(counts, rounds=3).transform(
        _psort, "item"
    )


def q159_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI MERGE INTO (upsert.merge_into): reconcile a partial user
    dimension (first-half aggregates, even user ids only) with a
    source batch (second-half aggregates) in the standard three
    clauses — WHEN MATCHED UPDATE (counters add), WHEN MATCHED AND
    s.n_events < 5 DELETE (churn), WHEN NOT MATCHED INSERT.  One
    full-outer hash join on the key; every clause a row-local
    projection.  The oracle replays the same FULL OUTER JOIN + CASE —
    the general lakehouse write primitive next to the specialized
    SCD1/SCD2 paths (q75/q152)."""
    from bloomy_etl_spark.operators.upsert import merge_into

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    cut = F.lit("2024-01-16").cast("date")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("v").cast("long").alias("v_sum_e4"),
        )

    target = agg(
        ev.filter((F.col("d") < cut) & (F.col("user_id") % 2 == 0))
    )
    source = agg(ev.filter(F.col("d") >= cut))
    out = merge_into(
        target,
        source,
        ["user_id"],
        update_set={
            "n_events": F.col("t.n_events") + F.col("s.n_events"),
            "v_sum_e4": F.col("t.v_sum_e4") + F.col("s.v_sum_e4"),
        },
        delete_where=F.col("s.n_events") < 5,
        insert_values={
            "n_events": F.col("s.n_events"),
            "v_sum_e4": F.col("s.v_sum_e4"),
        },
        check_unique=True,
    )
    return out.transform(_psort, "user_id")


def q160_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average load
    (timeseries.time_weighted_avg) — the hypertable aggregate a plain
    AVG gets wrong on irregular sampling: each event's v_e4 holds
    (LOCF) until the next event, the integral divides by total held
    time.  Exact integers end-to-end (ms-quantized widths; see the
    operator's overflow posture); the oracle replays the identical
    lead-window weighting."""
    from bloomy_etl_spark.operators.timeseries import time_weighted_avg

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    return time_weighted_avg(ev).transform(_psort, "user_id")


def q161_streaming_zonemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental layout maintenance under the driver hash gate: the
    events fixture replays as three micro-batches (sliced by
    ``event_id % 3`` — replayable in SQL, unlike a hash slice), each
    batch gets its own exact Z-layout, and the durable zone-map index
    is hashed against an oracle that re-derives every batch's file
    cuts with a per-slice sequential rank.  This gates the real lake
    write path between OPTIMIZE runs: per-batch layout + an O(files)
    skipping index, with q150 as the full-rewrite endpoint."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.streaming.ingest import (
        read_zonemap_state,
        streaming_zonemap_ingest,
    )

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), "q161", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        ev = _t(spark, sf_dir, "events").select(
            "event_id",
            F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("xb"),
            F.pmod(
                F.datediff(F.col("ts").cast("date"),
                           F.lit("2024-01-01").cast("date")),
                F.lit(256),
            ).cast("long").alias("yb"),
        )
        replay = os.path.join(base, "replay")
        for bi in range(3):
            ev.filter(F.col("event_id") % 3 == bi).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(replay, f"b{bi}"))
        # pin arrival order so foreachBatch batch_id b == slice b
        import glob

        for i, p in enumerate(
            sorted(glob.glob(os.path.join(replay, "b*", "part-*")))
        ):
            os.utime(p, (1_000_000 + 10 * i, 1_000_000 + 10 * i))
        stream = (
            spark.readStream.schema("event_id long, xb long, yb long")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(replay, "b*"))
        )
        q = streaming_zonemap_ingest(
            stream,
            os.path.join(base, "state"),
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q161 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    return read_zonemap_state(spark, os.path.join(base, "state")).transform(
        _psort, "batch_id", "file_id"
    )


def q162_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution with a 7-day lookback — the marketing /
    growth-analytics primitive: every purchase credits the user's most
    recent preceding view or click (ties at one instant prefer click,
    the deeper intent).  One user-keyed window pass: the running last
    touch is a MAX over ``eus·10 + code`` (eus is monotone in the
    frame, so MAX ≡ latest; the ×10 packing keeps type without a
    second column and stays < 2⁶³ by 8 orders) — portable to any
    engine, no IGNORE NULLS dependence.  Purchases with no touch in
    window attribute to 'direct'."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("eus"),
        "event_id",
        "event_type",
    )
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .otherwise(None)
        .cast("long")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("eus").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev.withColumn(
        "__lt", F.max(F.col("eus") * 10 + code).over(w)
    )
    lookback = 7 * 86_400_000_000
    t_eus = F.expr("__lt DIV 10")
    in_window = F.col("__lt").isNotNull() & (
        F.col("eus") - t_eus <= lookback
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("eus").alias("purchase_eus"),
            F.when(in_window, t_eus).alias("touch_eus"),
            F.when(
                in_window,
                F.when(F.col("__lt") % 10 == 2, "click").otherwise("view"),
            )
            .otherwise("direct")
            .alias("channel"),
            F.when(in_window, F.col("eus") - t_eus)
            .cast("long")
            .alias("lag_us"),
        )
        .transform(_psort, "purchase_id")
    )


def q163_weighted_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-weighted proximity to seed suppliers (graph.weighted_sssp,
    4 Bellman-Ford rounds): the co-purchase graph's edges cost
    ``10⁶ DIV support`` (strong ties are cheap), seeds are every
    20th supplier, and the answer is each reachable supplier's exact
    min path cost within 4 edges — weighted reachability next to
    q97's hop-count BFS.  All-integer relaxations; the oracle unrolls
    the identical rounds."""
    from bloomy_etl_spark.operators.graph import basket_pairs, weighted_sssp

    # r9: in-row basket pairs (graph.basket_pairs) replace the self-join
    # edge build — see q141.
    und = (
        basket_pairs(
            _t(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("o"),
                    F.col("l_suppkey").alias("s")),
            key="o", item="s", weight="n",
        )
        .withColumn("w", F.expr("CAST(1000000 AS BIGINT) DIV n"))
    )
    sym = und.select(F.col("x").alias("src"), F.col("y").alias("dst"), "w").unionByName(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"), "w")
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    seeds = nodes.filter(F.col("node") % 20 == 0)
    return (
        weighted_sssp(sym, seeds, rounds=4)
        .select(F.col("node").cast("long").alias("supp_key"), "dist")
        .transform(_psort, "supp_key")
    )


def q164_mixture_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mixture diversity — the corpus-composition
    audit a data-mixing pass reads before setting quotas: Simpson
    concentration ``Σ shareᵢ²``, its Gini-impurity complement, and the
    inverse-Simpson EFFECTIVE language count, all EXACT integer
    rationals (``S·10⁶ DIV n²`` — no per-term flooring, one division,
    so both engines compute the identical millionths; bound: needs
    n ≤ ~10⁷ docs per source for the e6 numerator to stay in int64 —
    beyond that, shard by source first).  Entropy-based diversity
    needs ln of data-dependent ratios (not portable); Simpson/Gini is
    the exact-arithmetic diversity pair.  Two map-side-combinable
    hash-aggs, group grain throughout."""
    docs = _t(spark, sf_dir, "documents", fan_out=True)
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    g = sl.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("__s"),
    )
    return (
        g.select(
            "source",
            "n_docs",
            "n_langs",
            F.expr("(__s * 1000000) DIV (n_docs * n_docs)")
            .alias("simpson_e6"),
            (F.lit(1_000_000)
             - F.expr("(__s * 1000000) DIV (n_docs * n_docs)"))
            .cast("long").alias("gini_e6"),
            F.expr("(n_docs * n_docs * 1000) DIV __s")
            .alias("eff_langs_e3"),
        )
        .transform(_psort, "source")
    )




def q165_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming last-touch attribution under the driver hash gate
    (the q144 pattern applied to q162, and the first FACT-STREAM
    gate): events replay as three time-ordered micro-batches through
    ``streaming_attribution_ingest`` — per-batch packed-MAX LOCF
    seeded from durable per-user last-touch state — and the emitted
    attributed-purchase log is hashed against the one-shot batch
    oracle.  Facts are final on emission (the monotone-touch
    argument); the hash match proves no purchase was attributed
    differently than the batch pass would, across every batch seam."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.streaming.ingest import (
        read_attributed_facts,
        streaming_attribution_ingest,
    )
    from bloomy_etl_spark.streaming.sources import replay_dir_ordered

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), "q165", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        replay = replay_dir_ordered(
            spark, sf_dir, os.path.join(base, "replay"), n_files=3
        )
        schema = spark.read.parquet(replay).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
            .select(
                "user_id",
                F.unix_micros("ts").alias("eus"),
                "event_id",
                "event_type",
            )
        )
        q = streaming_attribution_ingest(
            stream,
            os.path.join(base, "facts"),
            os.path.join(base, "state"),
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q165 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    return read_attributed_facts(
        spark, os.path.join(base, "facts")
    ).transform(_psort, "purchase_id")


def q166_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine sketch-accuracy audit (the q126/q157 pattern applied
    to cardinality sketches): per event type, a k=64 KMV estimate of
    distinct users over the PORTABLE md5 hash — deliberately in the
    estimation regime (k < the ~150-user domain) — against the exact
    COUNT DISTINCT, with the relative error in exact millionths.  The
    whole audit is integer arithmetic: the 32-bit hash keeps
    ``(k−1)·2³² DIV h_k`` inside int64, the exact-regime fallback
    (fewer distincts than k) returns the count itself, and the error
    is a single integer division — so the measured accuracy of the
    probabilistic tier is itself driver-hash-gated, not a notebook
    claim."""
    k, H = 64, 1 << 32
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("long").alias("__h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy(F.col("__h").asc())
    sk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__sz"),
            F.max("__h").alias("__hk"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.when(F.col("__sz") < k, F.col("__sz"))
            .otherwise(
                F.expr(f"({k - 1} * CAST({H} AS BIGINT)) "
                       "DIV GREATEST(__hk, CAST(1 AS BIGINT))")
            )
            .cast("long")
            .alias("n_est"),
        )
        .withColumn(
            "err_e6",
            F.expr("ABS(n_est - n_exact) * 1000000 DIV n_exact"),
        )
        .transform(_psort, "event_type")
    )


def q167_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day PEAK concurrent sessions — the capacity-planning sweep
    line: sessionize (30-min gap), explode each session into +1/−1
    boundary events (half-open [start, end): ends sort before starts
    at one instant), and run an EXACT global running balance with the
    two-phase distributed scan at day grain — within-day prefix sums
    ride a day-partitioned window, cross-day offsets come from the
    bounded day-grain net table (the q129/q150 shape at a third
    granularity; no single-task timeline anywhere).  All integers; the
    oracle replays the identical sweep with one sequential window."""
    from bloomy_etl_spark.operators.corpus import sessionize

    ev = _t(spark, sf_dir, "events")
    sess = (
        sessionize(ev, gap_s=1800)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.unix_micros("ts")).alias("s_eus"),
            (F.max(F.unix_micros("ts")) + 1).alias("e_eus"),
        )
    )
    # r9 opt (guide §2.4): the +1/−1 boundary events explode IN-ROW from
    # each session instead of a two-branch union — the union evaluated
    # the whole sessionize window chain once per branch, and its two
    # consumers (`run`, `net`) doubled that again (plan: 4 evaluations,
    # only the scan exchange reused). With the explode, `run` and `net`
    # both sit above the SAME hash(day) exchange (`net` now derives from
    # `run`'s frame, which carries delta), so exchange reuse computes
    # sessionize exactly once. Same (eus, delta, day) multiset; the
    # running sum's tie groups carry equal deltas, so every per-day
    # max(off+run) is order-invariant — results identical.
    bounds = sess.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s_eus").alias("eus"),
                    F.lit(1).cast("long").alias("delta"),
                ),
                F.struct(
                    F.col("e_eus").alias("eus"),
                    F.lit(-1).cast("long").alias("delta"),
                ),
            )
        ).alias("be")
    ).select(
        F.col("be.eus").alias("eus"), F.col("be.delta").alias("delta")
    ).withColumn("day", F.expr("eus DIV 86400000000"))
    w_day = Window.partitionBy("day").orderBy(
        F.col("eus").asc(), F.col("delta").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = bounds.withColumn("__run", F.sum("delta").over(w_day))
    net = run.groupBy("day").agg(F.sum("delta").alias("__net"))
    w_off = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = net.select(
        "day", F.coalesce(F.sum("__net").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        run.join(F.broadcast(offs), "day")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_boundaries"),
            F.max(F.col("__off") + F.col("__run")).cast("long")
            .alias("peak_sessions"),
        )
        .transform(_psort, "day")
    )


def q168_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: per day, DAU, trailing-7-day WAU, and the
    DAU/WAU stickiness ratio in exact millionths.  The sliding
    DISTINCT is computed at the (day, user) grain — dedupe first (the
    bounded frame: days × users), then each active day map-side
    emits the ≤ 7 window days it contributes to, and one hash-agg
    counts distinct users per window end.  Shuffle is bounded by
    days × users × 7, never by raw events; no self-join of the event
    table, no window over corpus rows.  Days with no 7-day history
    still report (the window only needs the day to exist)."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"), "user_id"
    )
    du = ev.distinct()
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("wday"),
        "user_id",
    )
    wau = contrib.groupBy("wday").agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    dau = du.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000000) DIV wau").alias("stickiness_e6"),
        )
        .transform(_psort, "day")
    )


def q169_percentile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank percentile grid (P10/P50/P90) of v_e4 per
    event type — the quantile FUNCTION surface next to q117's
    interpolated median/MAD and q100's sketch tier: nearest-rank
    (``value at ceil(p·n/100)`` in sorted order) is the
    integer-exact convention, so every grid cell is a value that
    actually occurs and both engines index the identical sorted
    list.  One hash-agg to sorted in-row arrays (the q140/q142
    bounded-group shape), indexing in codegen."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 10000).cast("long").alias("v"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array_sort(F.collect_list("v")).alias("__vs"),
    )
    def pick(p: int):
        # ceil(p·n/100) as (p·n + 99) DIV 100: all operands positive,
        # so Spark's truncating DIV and DuckDB's flooring // agree
        idx = F.expr(f"CAST(({p} * n + 99) DIV 100 AS INT)")
        return F.element_at(F.col("__vs"), idx)
    return (
        g.select(
            "event_type",
            "n",
            pick(10).alias("p10_e4"),
            pick(50).alias("p50_e4"),
            pick(90).alias("p90_e4"),
        )
        .transform(_psort, "event_type")
    )


# ONE SQL text, run verbatim by BOTH engines: q170 is the SQL entry
# path (spark.sql over registered views) — correlated scalar
# subqueries (decorrelated by Catalyst into aggregated joins),
# EXISTS / NOT EXISTS (semi/anti joins), and null-safe COALESCE
# margins. The balance test cross-multiplies (cents·n > Σcents)
# so the "above nation average" predicate is exact integers — no
# float average ever computed.
_Q170_SQL = """
    WITH cust AS (
        SELECT c_custkey, c_nationkey,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer),
    rich AS (
        SELECT c.c_nationkey, COUNT(*) AS n_rich
        FROM cust c
        WHERE c.cents * (SELECT COUNT(*) FROM cust x
                         WHERE x.c_nationkey = c.c_nationkey)
              > (SELECT SUM(x.cents) FROM cust x
                 WHERE x.c_nationkey = c.c_nationkey)
        GROUP BY c.c_nationkey),
    idle AS (
        SELECT s.s_nationkey AS nk, COUNT(*) AS n_idle
        FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_suppkey = s.s_suppkey)
        GROUP BY s.s_nationkey),
    od AS (
        SELECT c.c_nationkey, COUNT(*) AS n_with_orders
        FROM cust c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey)
    SELECT n.n_name,
           CAST(COALESCE(r.n_rich, 0) AS BIGINT) AS n_rich,
           CAST(COALESCE(i.n_idle, 0) AS BIGINT) AS n_idle_supp,
           CAST(COALESCE(od.n_with_orders, 0) AS BIGINT) AS n_with_orders
    FROM nation n
    LEFT JOIN rich r ON r.c_nationkey = n.n_nationkey
    LEFT JOIN idle i ON i.nk = n.n_nationkey
    LEFT JOIN od ON od.c_nationkey = n.n_nationkey
    ORDER BY n.n_name
"""


def q170_subquery_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ENTRY PATH: q170 registers the fixture tables as temp
    views and runs ONE ANSI SQL text — the identical string the
    DuckDB oracle runs — through ``spark.sql``: correlated scalar
    subqueries (Catalyst decorrelates them into aggregate joins; the
    plan pin asserts no nested-loop fallback), EXISTS → semi join,
    NOT EXISTS → anti join, and COALESCE margins.  Every predicate is
    exact integer arithmetic (the nation-average balance test
    cross-multiplies instead of averaging), so the SQL surface is
    hash-gated like every DataFrame query."""
    for t in ["customer", "supplier", "lineitem", "orders", "nation"]:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q170_SQL)


def q171_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test CONTAMINATION audit — the leakage check every
    eval-trustworthy corpus build runs and almost none gate: near-dup
    pairs (the exact n-gram Jaccard edge set, q42's input) whose
    endpoints landed in DIFFERENT splits (q47's deterministic
    hash-split, 60/20/20 here so the audit has teeth at fixture
    scale).  A pair crossing train→test means the test set leaks
    training content; the output is the pair-grain evidence table a
    release review reads.  Composition of two already-gated operators
    — the audit itself adds two broadcast-size joins on the pair
    list."""
    from bloomy_etl_spark.operators import corpus as C
    from bloomy_etl_spark.operators import dedup as D

    docs = _t(spark, sf_dir, "documents", fan_out=True)
    pairs = D.ngram_jaccard_pairs(docs).select("i", "j")
    # r9 opt: the split is a PURE hash of the id (corpus.split_of), so
    # both endpoints' splits compute in-row ON the pair list — the two
    # join-backs to the document table (each a broadcast build over a
    # fan-out exchange) are gone; identical assignment by construction
    # (guide §2.4: remove shuffles outright). Plan: 2 joins + 2 scans
    # fewer; the Jaccard subtree is now the entire cost.
    return (
        pairs.withColumn("split_i", C.split_of("i", train_pct=60, val_pct=20))
        .withColumn("split_j", C.split_of("j", train_pct=60, val_pct=20))
        .filter(F.col("split_i") != F.col("split_j"))
        .select("i", "j", "split_i", "split_j")
        .transform(_psort, "i", "j")
    )


def q172_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the FK health check a
    warehouse runs before trusting joins: for every foreign-key edge
    of the schema, the child row count, the orphan count (no match in
    the parent), and the DISTINCT orphan key count.  Each edge is ONE
    scan of the child: a broadcast LEFT join against the parent's
    distinct keys attaches a match flag per child row and a single
    aggregate reads off all three figures (r9: previously the child
    was scanned twice — a bare count plus a left-anti aggregate —
    glued by a 1-row BroadcastNestedLoopJoin; guide §2.3/§6 — this
    halves the audit's child-table I/O at scale).  The flag equals the
    anti-join predicate because the parent side is made distinct, so
    no child row is multiplied; NULL child keys never match, exactly
    like the anti join.  Complements q72's single-table column checks
    with the BETWEEN-tables contract."""
    edges = [
        ("orders.o_custkey", "orders", "o_custkey", "customer",
         "c_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey", "orders",
         "o_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey", "part",
         "p_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey", "supplier",
         "s_suppkey"),
        ("customer.c_nationkey", "customer", "c_nationkey", "nation",
         "n_nationkey"),
        ("supplier.s_nationkey", "supplier", "s_nationkey", "nation",
         "n_nationkey"),
        ("nation.n_regionkey", "nation", "n_regionkey", "region",
         "r_regionkey"),
    ]
    outs = []
    for name, child, ck, parent, pk in edges:
        c = _t(spark, sf_dir, child).select(F.col(ck).alias("__k"))
        p = (
            _t(spark, sf_dir, parent)
            .select(F.col(pk).alias("__k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        flagged = c.join(F.broadcast(p), "__k", "left")
        orphan = F.col("__hit").isNull()
        outs.append(
            flagged.agg(
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.coalesce(F.sum(orphan.cast("long")), F.lit(0))
                .cast("long").alias("n_orphans"),
                F.count_distinct(F.when(orphan, F.col("__k")))
                .cast("long").alias("n_orphan_keys"),
            ).select(F.lit(name).alias("fk"), "n_child", "n_orphans",
                     "n_orphan_keys")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.transform(_psort, "fk")


def q173_streaming_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live engagement under the driver hash gate: events replay as
    three hash-sliced micro-batches through ``streaming_active_ingest``
    (distinct (day, user) deltas — set union is confluent, any
    slicing), and the DAU/WAU/stickiness readout recomputed from the
    merged store is hashed against q168's batch oracle.  The live
    dashboard equals the batch report, forever, at domain-sized
    per-batch cost."""
    import hashlib
    import os
    import shutil
    import tempfile

    from bloomy_etl_spark.streaming.ingest import (
        read_active_pairs,
        streaming_active_ingest,
    )

    src = os.path.join(sf_dir, "events.parquet")
    key = (id(spark), "q173", sf_dir, os.stat(src).st_mtime_ns)
    base = _STREAM_MEMO.get(key)
    if base is None or not os.path.isfile(os.path.join(base, "_BUILD_OK")):
        base = os.path.join(
            tempfile.gettempdir(), "bloomy_stream",
            f"{os.getpid()}-"
            + hashlib.md5(repr(key).encode()).hexdigest()[:12],
        )
        shutil.rmtree(base, ignore_errors=True)
        ev = _t(spark, sf_dir, "events").select(
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
            "user_id",
            "event_id",
        )
        replay = os.path.join(base, "replay")
        for bi in range(3):
            ev.filter(
                F.pmod(F.xxhash64("event_id"), F.lit(3)) == bi
            ).select("day", "user_id").coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(replay, f"b{bi}"))
        stream = (
            spark.readStream.schema("day long, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(replay, "b*"))
        )
        q = streaming_active_ingest(
            stream,
            os.path.join(base, "state"),
            os.path.join(base, "ckpt"),
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("q173 replay stream did not finish")
        with open(os.path.join(base, "_BUILD_OK"), "w") as f:
            f.write("ok")
        _STREAM_MEMO[key] = base
    du = read_active_pairs(spark, os.path.join(base, "state"))
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("wday"),
        "user_id",
    )
    wau = contrib.groupBy("wday").agg(
        F.count_distinct("user_id").cast("long").alias("wau")
    )
    dau = du.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau")
    )
    return (
        dau.join(wau, dau["day"] == wau["wday"])
        .select(
            "day",
            "dau",
            "wau",
            F.expr("(dau * 1000000) DIV wau").alias("stickiness_e6"),
        )
        .transform(_psort, "day")
    )


def q174_contribution_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-cause contribution analysis — the "WHY did the metric
    move" step after q86/q149 flag THAT it moved: for every day whose
    event volume shifted ≥ 2% day-over-day, find the event type whose
    volume SHARE shifted most (exact e6 shares, shift = |share −
    prev_share|, ties to the smallest type name).  All integer
    millionths; windows run at day- and (day, type)-grain — domain
    frames, never event grain."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        "event_type",
    )
    dt = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    d = dt.groupBy("day").agg(F.sum("n").cast("long").alias("n_total"))
    w_d = Window.orderBy("day")
    days = d.withColumn("__prev", F.lag("n_total").over(w_d)).filter(
        F.col("__prev").isNotNull()
    ).withColumn(
        "delta_e6",
        F.expr("((n_total - __prev) * 1000000) DIV __prev"),
    ).filter(F.abs(F.col("delta_e6")) >= 20_000)
    shares = dt.join(d, "day").withColumn(
        "share_e6", F.expr("(n * 1000000) DIV n_total")
    )
    w_t = Window.partitionBy("event_type").orderBy("day")
    shifts = shares.withColumn(
        "__ps", F.lag("share_e6").over(w_t)
    ).filter(F.col("__ps").isNotNull()).withColumn(
        "shift_e6", F.abs(F.col("share_e6") - F.col("__ps"))
    )
    w_rank = Window.partitionBy("day").orderBy(
        F.col("shift_e6").desc(), F.col("event_type").asc()
    )
    top = shifts.withColumn("__rn", F.row_number().over(w_rank)).filter(
        F.col("__rn") == 1
    ).select("day", F.col("event_type").alias("top_type"), "shift_e6")
    return (
        days.join(top, "day")
        .select("day", "n_total", "delta_e6", "top_type", "shift_e6")
        .transform(_psort, "day")
    )


def q175_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style catalog statistics — the table profile a
    cost-based optimizer (and q56's join-order advisor) feeds on: one
    row per table with row count, exact key-column NDV, and the key
    min/max zone. Each table is one hash-agg; the report is the
    10-row union."""
    keys = {
        "region": "r_regionkey", "nation": "n_nationkey",
        "customer": "c_custkey", "supplier": "s_suppkey",
        "part": "p_partkey", "orders": "o_orderkey",
        "lineitem": "l_orderkey", "events": "event_id",
        "documents": "doc_id", "embeddings": "vec_id",
    }
    outs = []
    for t, k in keys.items():
        outs.append(
            _t(spark, sf_dir, t).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count_distinct(F.col(k)).cast("long").alias("key_ndv"),
                F.min(F.col(k)).cast("long").alias("key_min"),
                F.max(F.col(k)).cast("long").alias("key_max"),
            ).select(F.lit(t).alias("tbl"), "n_rows", "key_ndv",
                     "key_min", "key_max")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.transform(_psort, "tbl")


ENGINE_QUERIES = {
    "q70_binned_range_join": q70_binned_range_join,
    "q71_salted_join": q71_salted_join,
    "q72_quality_suite": q72_quality_suite,
    "q73_incremental_agg": q73_incremental_agg,
    "q74_fuzzy_name_pairs": q74_fuzzy_name_pairs,
    "q75_scd2_history": q75_scd2_history,
    "q76_k_anonymity": q76_k_anonymity,
    "q77_hard_negatives": q77_hard_negatives,
    "q78_bloom_semi_join": q78_bloom_semi_join,
    "q79_kmv_overlap": q79_kmv_overlap,
    "q80_gapfill_series": q80_gapfill_series,
    "q81_spatial_neighbors": q81_spatial_neighbors,
    "q82_supplier_pagerank": q82_supplier_pagerank,
    "q83_cube_revenue": q83_cube_revenue,
    "q84_retention_cohorts": q84_retention_cohorts,
    "q85_event_transitions": q85_event_transitions,
    "q86_rolling_anomaly": q86_rolling_anomaly,
    "q87_matview_rollup": q87_matview_rollup,
    "q88_scd2_asof_enrich": q88_scd2_asof_enrich,
    "q89_semantic_decontam": q89_semantic_decontam,
    "q90_user_golden_record": q90_user_golden_record,
    "q91_centroid_label_audit": q91_centroid_label_audit,
    "q92_sequential_ids": q92_sequential_ids,
    "q93_window_ranks": q93_window_ranks,
    "q94_pivot_daily_types": q94_pivot_daily_types,
    "q95_multiset_ops": q95_multiset_ops,
    "q96_modern_aggs": q96_modern_aggs,
    "q97_bfs_reach": q97_bfs_reach,
    "q98_linreg_trend": q98_linreg_trend,
    "q99_pseudonymized_release": q99_pseudonymized_release,
    "q100_hist_quantiles": q100_hist_quantiles,
    "q114_range_frame_window": q114_range_frame_window,
    "q115_grouping_sets": q115_grouping_sets,
    "q116_unpivot_daily": q116_unpivot_daily,
    "q117_robust_stats": q117_robust_stats,
    "q119_hll_registers": q119_hll_registers,
    "q131_gdpr_delete": q131_gdpr_delete,
    "q134_skew_profile": q134_skew_profile,
    "q135_calibration_bins": q135_calibration_bins,
    "q140_conversion_funnel": q140_conversion_funnel,
    "q141_triangle_parts": q141_triangle_parts,
    "q142_ewma_baseline": q142_ewma_baseline,
    "q143_pareto_frontier": q143_pareto_frontier,
    "q144_streaming_ewma_state": q144_streaming_ewma_state,
    "q145_supplier_communities": q145_supplier_communities,
    "q146_mg_frequent_users": q146_mg_frequent_users,
    "q147_sequence_pattern": q147_sequence_pattern,
    "q148_streaming_cluster_state": q148_streaming_cluster_state,
    "q149_cusum_changepoints": q149_cusum_changepoints,
    "q150_zorder_zonemaps": q150_zorder_zonemaps,
    "q151_vote_consensus": q151_vote_consensus,
    "q152_state_run_history": q152_state_run_history,
    "q153_streaming_cusum_state": q153_streaming_cusum_state,
    "q154_bradley_terry": q154_bradley_terry,
    "q155_supplier_kcore": q155_supplier_kcore,
    "q156_streaming_scd2_state": q156_streaming_scd2_state,
    "q158_streaming_leaderboard": q158_streaming_leaderboard,
    "q159_merge_upsert": q159_merge_upsert,
    "q160_time_weighted_avg": q160_time_weighted_avg,
    "q161_streaming_zonemaps": q161_streaming_zonemaps,
    "q162_touch_attribution": q162_touch_attribution,
    "q163_weighted_proximity": q163_weighted_proximity,
    "q164_mixture_diversity": q164_mixture_diversity,
    "q165_streaming_attribution": q165_streaming_attribution,
    "q166_sketch_accuracy": q166_sketch_accuracy,
    "q167_peak_concurrency": q167_peak_concurrency,
    "q168_rolling_actives": q168_rolling_actives,
    "q169_percentile_grid": q169_percentile_grid,
    "q170_subquery_pack": q170_subquery_pack,
    "q171_split_leakage": q171_split_leakage,
    "q172_referential_audit": q172_referential_audit,
    "q173_streaming_engagement": q173_streaming_engagement,
    "q174_contribution_analysis": q174_contribution_analysis,
    "q175_catalog_stats": q175_catalog_stats,
}


ENGINE_ORACLE_SQL = {
    "q70_binned_range_join": f"""
        WITH p AS (
            SELECT DISTINCT CAST(DATEDIFF('day', DATE '{_EPOCH}',
                                 CAST(l_shipdate AS DATE)) AS BIGINT) AS day
            FROM lineitem
        ),
        i AS (
            SELECT CAST(DATEDIFF('day', DATE '{_EPOCH}',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS lo,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT p.day, CAST(SUM(i.n) AS BIGINT) AS n_open
        FROM p JOIN i ON p.day BETWEEN i.lo AND i.lo + 30
        GROUP BY p.day
        ORDER BY p.day
    """,
    "q71_salted_join": """
        SELECT o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q72_quality_suite": """
        WITH a AS (
            SELECT COUNT(*) AS cnt,
                   COUNT(o_custkey) AS n_cust,
                   COUNT(o_orderkey) AS n_ok,
                   COUNT(DISTINCT o_orderkey) AS d_ok,
                   COUNT(CASE WHEN o_totalprice < 1.0
                              OR o_totalprice > 500000.0 THEN 1 END) AS bad_price,
                   COUNT(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F','O','P') THEN 1 END) AS bad_status,
                   COUNT(CASE WHEN o_orderpriority IS NOT NULL
                              AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+')
                              THEN 1 END) AS bad_prio,
                   COUNT(CASE WHEN o_custkey < 0 THEN 1 END) AS bad_ship
            FROM orders
        )
        SELECT * FROM (
            SELECT 'not_null(o_custkey)' AS "constraint",
                   ROUND((cnt - n_cust) / CAST(cnt AS DOUBLE), 6) AS metric,
                   (cnt - n_cust) / CAST(cnt AS DOUBLE) <= 0.0 AS passed
            FROM a
            UNION ALL
            SELECT 'unique(o_orderkey)',
                   CAST(n_ok - d_ok AS DOUBLE),
                   n_ok - d_ok = 0 FROM a
            UNION ALL
            SELECT 'in_range(o_totalprice,1.0,500000.0)',
                   CAST(bad_price AS DOUBLE), bad_price = 0 FROM a
            UNION ALL
            SELECT 'accepted_values(o_orderstatus)',
                   CAST(bad_status AS DOUBLE), bad_status = 0 FROM a
            UNION ALL
            SELECT 'matches(o_orderpriority)',
                   CAST(bad_prio AS DOUBLE), bad_prio = 0 FROM a
            UNION ALL
            SELECT 'non_negative(o_custkey)',
                   CAST(bad_ship AS DOUBLE), bad_ship = 0 FROM a
        )
        ORDER BY "constraint"
    """,
    "q74_fuzzy_name_pairs": """
        WITH names AS (
            SELECT DISTINCT p_name AS v FROM part WHERE p_name IS NOT NULL
        )
        SELECT a.v AS a, b.v AS b,
               CAST(levenshtein(a.v, b.v) AS BIGINT) AS dist
        FROM names a JOIN names b
          ON a.v < b.v AND levenshtein(a.v, b.v) <= 2
        ORDER BY a, b
    """,
    "q75_scd2_history": """
        WITH obs AS (
            SELECT DISTINCT o_custkey AS custkey,
                            o_orderstatus AS status,
                            o_orderdate AS eff_ts
            FROM orders
        ),
        ord AS (
            SELECT custkey, status, eff_ts,
                   ROW_NUMBER() OVER w AS rn,
                   LAG(status) OVER w AS prev
            FROM obs
            WINDOW w AS (PARTITION BY custkey ORDER BY eff_ts, status)
        ),
        kept AS (
            SELECT custkey, status, eff_ts FROM ord
            WHERE rn = 1 OR status IS DISTINCT FROM prev
        )
        SELECT custkey, status, eff_ts,
               LEAD(eff_ts) OVER w2 AS end_ts,
               LEAD(eff_ts) OVER w2 IS NULL AS is_current
        FROM kept
        WINDOW w2 AS (PARTITION BY custkey ORDER BY eff_ts, status)
        ORDER BY custkey, eff_ts, status
    """,
    "q77_hard_negatives": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
            FROM embeddings WHERE vec_id % 100 = 0
        ),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   e.label AS neighbor_label,
                   list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
                    sqrt(list_dot_product(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))) AS cos_sim
            FROM q JOIN embeddings e
              ON e.vec_id <> q.query_id
             AND e.label IS DISTINCT FROM q.qlabel
        ),
        ranked AS (
            SELECT query_id, neighbor_id, neighbor_label, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id
                   ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, neighbor_label,
               ROUND(cos_sim, 4) AS cos_sim, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
    "q76_k_anonymity": """
        WITH classes AS (
            SELECT c_mktsegment, c_nationkey,
                   CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   COUNT(*) AS n
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_classes,
               COUNT(CASE WHEN n < 5 THEN 1 END) AS n_violating,
               CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT)
                   AS n_at_risk,
               MIN(n) AS min_class_size
        FROM classes
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q78_bloom_semi_join": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS total_price
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 1000
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q79_kmv_overlap": """
        WITH d AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events WHERE user_id IS NOT NULL
        ),
        c AS (SELECT day, COUNT(*) AS n FROM d GROUP BY day),
        pairs AS (
            SELECT a.day AS day_a, b.day AS day_b,
                   a.n AS n_a, b.n AS n_b
            FROM c a JOIN c b ON b.day = a.day + 1
        ),
        inter AS (
            SELECT a.day AS day_a, COUNT(*) AS n_i
            FROM d a JOIN d b
              ON b.user_id = a.user_id AND b.day = a.day + 1
            GROUP BY a.day
        )
        SELECT p.day_a, p.day_b,
               CAST(p.n_a AS BIGINT) AS est_a,
               CAST(p.n_b AS BIGINT) AS est_b,
               CAST(p.n_a + p.n_b - COALESCE(i.n_i, 0) AS BIGINT) AS est_union,
               CAST(COALESCE(i.n_i, 0) AS BIGINT) AS est_inter,
               ROUND(COALESCE(i.n_i, 0) /
                     CAST(p.n_a + p.n_b - COALESCE(i.n_i, 0) AS DOUBLE),
                     4) AS jaccard
        FROM pairs p LEFT JOIN inter i ON i.day_a = p.day_a
        ORDER BY p.day_a
    """,
    "q80_gapfill_series": f"""
        WITH obs AS (
            SELECT user_id,
                   CAST(DATEDIFF('day', DATE '{_EPOCH}',
                                 CAST(ts AS DATE)) AS BIGINT) AS day,
                   ROUND(AVG(value), 6) AS v
            FROM events
            WHERE user_id % 5 = 0 AND event_type = 'purchase'
            GROUP BY 1, 2
        ),
        nx AS (
            SELECT *, LEAD(day) OVER w AS nday, LEAD(v) OVER w AS nv
            FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY day)
        ),
        grid AS (
            SELECT user_id, day, v, nday, nv,
                   UNNEST(generate_series(day, COALESCE(nday - 1, day))) AS d
            FROM nx
        )
        SELECT user_id, d AS day,
               CAST(FLOOR((CASE WHEN d = day THEN v
                           ELSE v + (nv - v) * (d - day) / (nday - day)
                           END) * 10000) AS BIGINT) AS value_e4,
               d = day AS observed
        FROM grid
        ORDER BY user_id, day
    """,
    "q81_spatial_neighbors": """
        WITH p AS (
            SELECT event_id AS pid,
                   CAST((event_id * 37) % 1000 AS DOUBLE) AS px,
                   CAST((event_id * 53) % 1000 AS DOUBLE) AS py
            FROM events WHERE event_id % 13 = 0
        )
        SELECT a.pid AS id_a, b.pid AS id_b,
               CAST((a.px - b.px) * (a.px - b.px)
                    + (a.py - b.py) * (a.py - b.py) AS BIGINT) AS dist2
        FROM p a JOIN p b
          ON a.pid < b.pid
         AND (a.px - b.px) * (a.px - b.px)
             + (a.py - b.py) * (a.py - b.py) <= 625.0
        ORDER BY id_a, id_b
    """,
    # 3-round replay of graph.py::pagerank. The fixture co-purchase
    # graph is symmetric, so the dangling-mass term the engine computes
    # is exactly 0.0 and the replay may omit it (adding 0.0 is an IEEE
    # no-op). Damping literals are cast to DOUBLE — DuckDB would
    # otherwise fold (1 - 0.85) in DECIMAL and diverge from the
    # engine's float math.
    "q82_supplier_pagerank": """
        WITH os AS (
            SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
        ),
        e0 AS (
            SELECT a.s AS src, b.s AS dst, CAST(COUNT(*) AS DOUBLE) AS w
            FROM os a JOIN os b ON a.o = b.o AND a.s <> b.s
            GROUP BY 1, 2
        ),
        e AS (
            SELECT src, dst, w / SUM(w) OVER (PARTITION BY src) AS frac
            FROM e0
        ),
        v AS (
            SELECT src AS node FROM e0
            UNION
            SELECT dst FROM e0
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM v, nn),
        c1 AS (
            SELECT e.dst, SUM(r.rank * e.frac) AS c
            FROM r0 r JOIN e ON r.node = e.src GROUP BY e.dst
        ),
        r1 AS (
            SELECT v.node,
                   ROUND((1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                         + CAST(0.85 AS DOUBLE) * COALESCE(c1.c, 0), 9) AS rank
            FROM v LEFT JOIN c1 ON v.node = c1.dst
        ),
        c2 AS (
            SELECT e.dst, SUM(r.rank * e.frac) AS c
            FROM r1 r JOIN e ON r.node = e.src GROUP BY e.dst
        ),
        r2 AS (
            SELECT v.node,
                   ROUND((1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                         + CAST(0.85 AS DOUBLE) * COALESCE(c2.c, 0), 9) AS rank
            FROM v LEFT JOIN c2 ON v.node = c2.dst
        ),
        c3 AS (
            SELECT e.dst, SUM(r.rank * e.frac) AS c
            FROM r2 r JOIN e ON r.node = e.src GROUP BY e.dst
        ),
        r3 AS (
            SELECT v.node,
                   ROUND((1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                         + CAST(0.85 AS DOUBLE) * COALESCE(c3.c, 0), 9) AS rank
            FROM v LEFT JOIN c3 ON v.node = c3.dst
        )
        SELECT CAST(node AS BIGINT) AS suppkey, ROUND(rank, 6) AS rank
        FROM r3
        ORDER BY suppkey
    """,
    "q83_cube_revenue": """
        SELECT COALESCE(l_returnflag, '__ALL__') AS returnflag,
               COALESCE(l_linestatus, '__ALL__') AS linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n_items,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, returnflag, linestatus
    """,
    "q84_retention_cohorts": f"""
        WITH uw AS (
            SELECT DISTINCT user_id,
                   CAST(DATEDIFF('day', DATE '{_EPOCH}',
                                 CAST(ts AS DATE)) AS BIGINT) AS day
            FROM events
        ),
        cohort AS (
            SELECT user_id, MIN(day) AS cohort_day FROM uw GROUP BY user_id
        ),
        sizes AS (
            SELECT cohort_day, COUNT(*) AS cohort_size
            FROM cohort GROUP BY cohort_day
        ),
        ret AS (
            SELECT c.cohort_day, u.day - c.cohort_day AS days_since,
                   COUNT(DISTINCT u.user_id) AS n_active
            FROM uw u JOIN cohort c ON u.user_id = c.user_id
            GROUP BY 1, 2
        )
        SELECT r.cohort_day, r.days_since, r.n_active, s.cohort_size,
               (r.n_active * 10000) // s.cohort_size AS retention_bp
        FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
        ORDER BY r.cohort_day, r.days_since
    """,
    "q85_event_transitions": """
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM seq
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
        ORDER BY prev_type, next_type
    """,
    "q86_rolling_anomaly": f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(DATEDIFF('day', DATE '{_EPOCH}',
                                 CAST(ts AS DATE)) AS BIGINT) AS day,
                   CAST(FLOOR(AVG(value) * 10000) AS BIGINT) AS v_e4
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT *,
                   COUNT(v_e4) OVER w AS n_win,
                   SUM(v_e4) OVER w AS s,
                   SUM(v_e4 * v_e4) OVER w AS q
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, day, v_e4,
               ((n_win * v_e4 - s) * (n_win * v_e4 - s)
                > 4 * (n_win * q - s * s)) AND n_win >= 7 AS is_anomaly,
               n_win
        FROM win
        ORDER BY event_type, day
    """,
    "q87_matview_rollup": """
        SELECT event_type,
               COUNT(*) AS n_rows,
               COUNT(value) AS n_val,
               ROUND(SUM(value), 4) AS total,
               ROUND(MIN(value), 4) AS mn,
               ROUND(MAX(value), 4) AS mx,
               ROUND(AVG(value), 4) AS mean,
               ROUND(STDDEV_POP(value), 4) AS sd
        FROM events
        WHERE DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
              BETWEEN 7 AND 21
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q88_scd2_asof_enrich": """
        WITH obs AS (
            SELECT DISTINCT o_custkey AS custkey,
                            o_orderstatus AS status,
                            o_orderdate AS eff_ts
            FROM orders
        ),
        ord AS (
            SELECT custkey, status, eff_ts,
                   ROW_NUMBER() OVER w AS rn,
                   LAG(status) OVER w AS prev
            FROM obs
            WINDOW w AS (PARTITION BY custkey ORDER BY eff_ts, status)
        ),
        kept AS (
            SELECT custkey, status, eff_ts FROM ord
            WHERE rn = 1 OR status IS DISTINCT FROM prev
        ),
        dim AS (
            SELECT custkey, status, eff_ts,
                   LEAD(eff_ts) OVER w2 AS end_ts
            FROM kept
            WINDOW w2 AS (PARTITION BY custkey ORDER BY eff_ts, status)
        )
        SELECT d.status AS status_at_order,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 4) AS total_price
        FROM orders o JOIN dim d
          ON d.custkey = o.o_custkey
         AND d.eff_ts <= o.o_orderdate
         AND (d.end_ts IS NULL OR o.o_orderdate < d.end_ts)
        GROUP BY 1
        ORDER BY 1
    """,
    "q89_semantic_decontam": """
        WITH bench AS (
            SELECT embedding AS bv FROM embeddings WHERE vec_id % 100 = 0
        ),
        scored AS (
            SELECT c.vec_id, c.label,
                   MAX(
                       list_dot_product(c.embedding::DOUBLE[], b.bv::DOUBLE[])
                       / (sqrt(list_dot_product(c.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(b.bv::DOUBLE[],
                                                  b.bv::DOUBLE[])))
                   ) AS max_sim
            FROM embeddings c CROSS JOIN bench b
            WHERE c.vec_id % 100 <> 0
            GROUP BY 1, 2
        )
        SELECT label,
               COUNT(*) AS n_vecs,
               CAST(SUM(CASE WHEN max_sim >= 0.25 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contam,
               ROUND(MAX(max_sim), 6) AS top_sim
        FROM scored
        GROUP BY label
        ORDER BY label
    """,
    "q90_user_golden_record": """
        WITH ranked AS (
            SELECT user_id, value, event_type, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn_last,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn_first
            FROM events
        ),
        lastv AS (
            SELECT user_id, value AS last_value FROM ranked WHERE rn_last = 1
        ),
        firstt AS (
            SELECT user_id, event_type AS first_type
            FROM ranked WHERE rn_first = 1
        ),
        modes AS (
            SELECT user_id, event_type AS top_type FROM (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY COUNT(*) DESC,
                                                   event_type DESC) AS rn
                FROM events
                WHERE event_type IS NOT NULL
                GROUP BY user_id, event_type
            ) WHERE rn = 1
        ),
        aggs AS (
            SELECT user_id,
                   ROUND(MAX(value), 4) AS peak_value,
                   COUNT(event_id) AS n_obs,
                   COUNT(DISTINCT event_type) AS n_types
            FROM events GROUP BY user_id
        )
        SELECT a.user_id,
               ROUND(l.last_value, 4) AS last_value,
               f.first_type, m.top_type,
               a.peak_value, a.n_obs, a.n_types
        FROM aggs a
        JOIN lastv l USING (user_id)
        JOIN firstt f USING (user_id)
        JOIN modes m USING (user_id)
        ORDER BY a.user_id
    """,
    "q91_centroid_label_audit": """
        WITH dims AS (
            SELECT label, i.pos,
                   ROUND(AVG(CAST(embedding[i.pos] AS DOUBLE)), 6) AS m
            FROM embeddings
            CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS pos) i
            GROUP BY label, i.pos
        ),
        cent AS (
            SELECT label AS clabel, list(m ORDER BY pos) AS cv
            FROM dims GROUP BY label
        ),
        scored AS (
            SELECT e.vec_id, e.label, c.clabel,
                   list_dot_product(e.embedding::DOUBLE[], c.cv)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                            e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(c.cv, c.cv))) AS sim
            FROM embeddings e CROSS JOIN cent c
        ),
        best AS (
            SELECT vec_id, label, clabel,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, clabel) AS rn
            FROM scored
        )
        SELECT label AS true_label, CAST(clabel AS INT) AS pred_label,
               COUNT(*) AS n
        FROM best WHERE rn = 1
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q92_sequential_ids": """
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey)
                    AS BIGINT) AS seq_id,
               c_custkey, c_acctbal
        FROM customer
        ORDER BY seq_id
    """,
    "q93_window_ranks": """
        SELECT c_mktsegment, c_custkey,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
               CAST(DENSE_RANK() OVER w AS INT) AS drank
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
        ORDER BY c_mktsegment, c_custkey
    """,
    "q94_pivot_daily_types": f"""
        SELECT CAST(DATEDIFF('day', DATE '{_EPOCH}',
                             CAST(ts AS DATE)) AS BIGINT) AS day,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                   AS n_purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events
        GROUP BY 1
        ORDER BY day
    """,
    "q95_multiset_ops": """
        WITH extra AS (
            SELECT user_id, COUNT(*) AS n_extra_clicks FROM (
                SELECT user_id FROM events WHERE event_type = 'click'
                EXCEPT ALL
                SELECT user_id FROM events WHERE event_type = 'view'
            ) GROUP BY user_id
        ),
        common AS (
            SELECT user_id, COUNT(*) AS n_common FROM (
                SELECT user_id FROM events WHERE event_type = 'click'
                INTERSECT ALL
                SELECT user_id FROM events WHERE event_type = 'view'
            ) GROUP BY user_id
        )
        SELECT COALESCE(e.user_id, c.user_id) AS user_id,
               COALESCE(e.n_extra_clicks, 0) AS n_extra_clicks,
               COALESCE(c.n_common, 0) AS n_common
        FROM extra e FULL OUTER JOIN common c ON e.user_id = c.user_id
        ORDER BY user_id
    """,
    "q96_modern_aggs": """
        WITH ranked AS (
            SELECT o_orderpriority, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey DESC) AS rn_top,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice,
                                               o_orderkey) AS rn_bot
            FROM orders
        ),
        aggs AS (
            SELECT o_orderpriority,
                   COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
                   BOOL_AND(o_custkey > 0) AS all_pos_cust,
                   BOOL_OR(o_orderstatus = 'P') AS any_pending,
                   ROUND(AVG(o_totalprice), 4) AS avg_price
            FROM orders GROUP BY o_orderpriority
        )
        SELECT a.o_orderpriority, a.n_big, a.all_pos_cust, a.any_pending,
               t.o_orderkey AS top_order, b.o_orderkey AS bottom_order,
               a.avg_price
        FROM aggs a
        JOIN ranked t ON t.o_orderpriority = a.o_orderpriority
                     AND t.rn_top = 1
        JOIN ranked b ON b.o_orderpriority = a.o_orderpriority
                     AND b.rn_bot = 1
        ORDER BY a.o_orderpriority
    """,
    "q97_bfs_reach": """
        WITH RECURSIVE os AS (
            SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
            FROM lineitem
        ),
        edges AS (
            SELECT p AS src, s AS dst FROM os
            UNION ALL
            SELECT s, p FROM os
        ),
        seeds AS (
            SELECT p_partkey * 2 AS node FROM part
            WHERE p_partkey % 500 = 0
        ),
        r(node, dist) AS (
            SELECT node, 0 FROM seeds
            UNION
            SELECT e.dst, r.dist + 1
            FROM r JOIN edges e ON e.src = r.node
            WHERE r.dist < 3
        ),
        bfs AS (
            SELECT node, MIN(dist) AS dist FROM r GROUP BY node
        )
        SELECT dist, COUNT(*) AS n_nodes,
               COUNT(CASE WHEN node % 2 = 0 THEN 1 END) AS n_parts,
               COUNT(CASE WHEN node % 2 = 1 THEN 1 END) AS n_suppliers
        FROM bfs
        GROUP BY dist
        ORDER BY dist
    """,
    "q98_linreg_trend": f"""
        WITH d AS (
            SELECT event_type, value,
                   CAST(DATEDIFF('day', DATE '{_EPOCH}',
                                 CAST(ts AS DATE)) AS DOUBLE) AS x
            FROM events
        ),
        s AS (
            SELECT event_type,
                   COUNT(CASE WHEN value IS NOT NULL
                              AND x IS NOT NULL THEN 1 END) AS n,
                   SUM(CASE WHEN value IS NOT NULL THEN x END) AS sx,
                   SUM(CASE WHEN x IS NOT NULL THEN value END) AS sy,
                   SUM(CASE WHEN value IS NOT NULL THEN x * x END) AS sxx,
                   SUM(CASE WHEN x IS NOT NULL
                            THEN value * value END) AS syy,
                   SUM(x * value) AS sxy
            FROM d
            GROUP BY event_type
        )
        SELECT event_type, n,
               ROUND(CASE WHEN n * sxx - sx * sx > 0
                     THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END,
                     6) AS slope,
               ROUND(CASE WHEN n * sxx - sx * sx > 0
                     THEN (sy - ((n * sxy - sx * sy)
                                 / (n * sxx - sx * sx)) * sx) / n END,
                     6) AS intercept,
               ROUND(CASE WHEN n * sxx - sx * sx > 0
                          AND n * syy - sy * sy > 0
                     THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                          / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END,
                     6) AS r2
        FROM s
        ORDER BY event_type
    """,
    "q73_incremental_agg": """
        SELECT event_type,
               COUNT(value) AS count,
               ROUND(SUM(value), 4) AS sum,
               ROUND(MIN(value), 4) AS min,
               ROUND(MAX(value), 4) AS max,
               ROUND(AVG(value), 4) AS avg,
               ROUND(STDDEV_POP(value), 4) AS stddev_pop
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    # q99: the token fn replays verbatim — same md5, same key prefix,
    # same 16-char truncation; join + rollup entirely in token space
    "q99_pseudonymized_release": f"""
        WITH c AS (
            SELECT SUBSTRING(MD5('{_Q99_KEY}:'
                                 || CAST(c_custkey AS VARCHAR)), 1, 16)
                       AS tok,
                   c_mktsegment
            FROM customer
        ),
        o AS (
            SELECT SUBSTRING(MD5('{_Q99_KEY}:'
                                 || CAST(o_custkey AS VARCHAR)), 1, 16)
                       AS tok,
                   o_totalprice
            FROM orders
        )
        SELECT c.c_mktsegment,
               COUNT(DISTINCT c.tok) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 4) AS revenue
        FROM o JOIN c ON o.tok = c.tok
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment
    """,
    # q100: exact replay of the histogram estimator — identical IEEE
    # double arithmetic at every step (bin = floor(v/width), cumulative
    # walk, first bin whose cum reaches r = q*n, linear interpolation,
    # [vmin, vmax] clamp). Tails are provably 0 for this range, so the
    # under/overflow branches (unit-tested) don't appear here.
    "q100_hist_quantiles": """
        WITH v AS (
            SELECT o_orderpriority AS pri,
                   CAST(o_totalprice AS DOUBLE) AS v
            FROM orders
        ),
        stats AS (
            SELECT pri, COUNT(v) AS n, MIN(v) AS vmin, MAX(v) AS vmax
            FROM v GROUP BY pri
        ),
        bins AS (
            SELECT pri, CAST(FLOOR(v / 10000.0) AS INT) AS b,
                   COUNT(*) AS c
            FROM v GROUP BY pri, b
        ),
        cum AS (
            SELECT pri, b, c,
                   CAST(SUM(c) OVER (PARTITION BY pri ORDER BY b)
                        AS DOUBLE) AS cum
            FROM bins
        ),
        qs AS (SELECT CAST(q AS DOUBLE) AS q
               FROM (VALUES (0.25), (0.5), (0.9)) AS t(q)),
        land AS (
            SELECT s.pri, qs.q, qs.q * CAST(s.n AS DOUBLE) AS r,
                   s.vmin, s.vmax,
                   (SELECT MIN(cm.b) FROM cum cm
                    WHERE cm.pri = s.pri
                      AND cm.cum >= qs.q * CAST(s.n AS DOUBLE)) AS b
            FROM stats s CROSS JOIN qs
        )
        SELECT l.pri AS o_orderpriority, l.q AS q,
               ROUND(LEAST(GREATEST(
                   0.0 + 10000.0 * (CAST(l.b AS DOUBLE)
                       + (l.r - (cm.cum - CAST(cm.c AS DOUBLE)))
                         / CAST(cm.c AS DOUBLE)),
                   l.vmin), l.vmax), 4) AS est
        FROM land l JOIN cum cm ON cm.pri = l.pri AND cm.b = l.b
        ORDER BY o_orderpriority, q
    """,
}

# q114: RANGE frame over integer epoch-µs; the frame sum is over
# floor(value·1e4) integers, exact under any accumulation order.
# SUM over BIGINT returns HUGEINT in DuckDB, which pandas renders as
# float64 — explicit CAST keeps the null-free column int64 like Spark's.
ENGINE_ORACLE_SQL["q114_range_frame_window"] = """
    WITH ev AS (
        SELECT event_id, user_id, epoch_us(ts) AS eus,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4
        FROM events
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(v_e4) OVER w AS BIGINT) AS sum_v_e4
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY eus
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
"""

# q131: the oracle replays the whole GDPR flow as plain anti-join
# aggregates over the source events — if the engine's partitioned
# rewrite, tombstone log, or derived-store replay drops or keeps one
# wrong row, some part's integer counts/sums diverge.
ENGINE_ORACLE_SQL["q131_gdpr_delete"] = """
    WITH ev AS (
        SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4
        FROM events
    ),
    del AS (SELECT DISTINCT user_id FROM ev WHERE user_id % 53 = 7),
    kept AS (SELECT * FROM ev
             WHERE user_id NOT IN (SELECT user_id FROM del)),
    e AS (SELECT 'events' AS part, day, COUNT(*) AS n,
                 CAST(SUM(v_e4) AS BIGINT) AS m
          FROM kept GROUP BY day),
    t AS (SELECT 'tomb' AS part, day, COUNT(*) AS n,
                 CAST(0 AS BIGINT) AS m
          FROM (SELECT DISTINCT user_id, day FROM ev
                WHERE user_id % 53 = 7) GROUP BY day),
    d AS (SELECT 'derived' AS part, 'ALL' AS day,
                 (SELECT COUNT(DISTINCT user_id) FROM kept) AS n,
                 (SELECT COUNT(*) FROM del) AS m)
    SELECT part, day, n, m FROM e
    UNION ALL SELECT part, day, n, m FROM t
    UNION ALL SELECT part, day, n, m FROM d
    ORDER BY part, day
"""

# q134: exact integer shares / HHI; DuckDB's integer products widen to
# HUGEINT — BIGINT casts per §2.10 rule (e).
ENGINE_ORACLE_SQL["q134_skew_profile"] = """
    WITH c AS (SELECT user_id AS key, COUNT(*) AS c
               FROM events GROUP BY user_id),
    g AS (SELECT SUM(c) AS n_rows, COUNT(*) AS n_keys,
                 SUM(c * c) AS sum_c2, MAX(c) AS max_c
          FROM c),
    t AS (SELECT key, c,
                 ROW_NUMBER() OVER (ORDER BY c DESC, key ASC) AS rank
          FROM c ORDER BY c DESC, key ASC LIMIT 10)
    SELECT t.rank, t.key, t.c,
           CAST((1000000 * t.c) // g.n_rows AS BIGINT) AS share_e6,
           CAST(g.n_rows AS BIGINT) AS n_rows,
           CAST(g.n_keys AS BIGINT) AS n_keys,
           CAST((1000000 * g.sum_c2) // (g.n_rows * g.n_rows) AS BIGINT)
               AS hhi_e6,
           CAST((1000000 * g.max_c) // g.n_rows AS BIGINT) AS top_share_e6
    FROM t CROSS JOIN g
    ORDER BY t.rank
"""

# q135: the bin id, mean score, and positive rate are all exact integer
# floor divisions — bit-identical replay.
ENGINE_ORACLE_SQL["q135_calibration_bins"] = r"""
    WITH s AS (
        SELECT CAST((1000000 * len(list_distinct(ws)))
                    // len(ws) AS BIGINT) AS score_e6,
               (lang = 'en') AS is_en
        FROM (SELECT string_split_regex(text, '\s+') AS ws, lang
              FROM documents)
    ),
    b AS (
        SELECT LEAST(9, CAST((score_e6 * 10) // 1000000 AS BIGINT)) AS bin,
               score_e6, is_en
        FROM s
    )
    SELECT bin, COUNT(*) AS n,
           CAST(SUM(score_e6) // COUNT(*) AS BIGINT) AS mean_score_e6,
           CAST((1000000 * SUM(CASE WHEN is_en THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS pos_rate_e6
    FROM b GROUP BY bin ORDER BY bin
"""

# q115: Spark's grouping_id() bit order is the same MSB-first over the
# listed columns as DuckDB's GROUPING(col1, col2).
ENGINE_ORACLE_SQL["q115_grouping_sets"] = """
    SELECT COALESCE(o_orderpriority, '__ALL__') AS priority,
           COALESCE(o_orderstatus, '__ALL__') AS status,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, priority, status
"""

# q116: the oracle reshapes with UNPIVOT (kept zero-cells via the
# pre-built wide grid, exactly the Spark plan's shape).
ENGINE_ORACLE_SQL["q116_unpivot_daily"] = """
    WITH base AS (
        SELECT CAST(DATEDIFF('day', DATE '1992-01-01',
                    CAST(ts AS DATE)) AS BIGINT) AS day, event_type
        FROM events
    ),
    wide AS (
        SELECT day,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'view') AS "view"
        FROM base GROUP BY day
    )
    SELECT day, event_type, n FROM (
        UNPIVOT wide ON click, error, purchase, signup, "view"
        INTO NAME event_type VALUE n
    )
    ORDER BY day, event_type
"""

# q117: integer-quantized values make the even-count median midpoint
# exact, so nested medians replay bit-identically.
ENGINE_ORACLE_SQL["q117_robust_stats"] = """
    WITH ev AS (
        SELECT event_type, FLOOR(value * 100) AS v FROM events
    ),
    med AS (
        SELECT event_type, COUNT(*) AS n, MEDIAN(v) AS med_e2
        FROM ev GROUP BY event_type
    ),
    dev AS (
        SELECT ev.event_type, m.n, m.med_e2,
               ABS(ev.v - m.med_e2) AS ad
        FROM ev JOIN med m USING (event_type)
    )
    SELECT event_type, n, med_e2, MEDIAN(ad) AS mad_e2
    FROM dev GROUP BY event_type, n, med_e2
    ORDER BY event_type
"""

# q119: the portable HLL replays because every step is integer
# arithmetic on the shared md5 int — bucket = h mod 64, rank from
# length(bin(w)) (both engines render binary without leading zeros),
# merge = bucket-wise MAX of the per-type registers.
ENGINE_ORACLE_SQL["q119_hll_registers"] = """
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('hllr:' || CAST(user_id AS VARCHAR)),
                                    1, 8)) AS BIGINT) AS hv
        FROM events
    ),
    b AS (
        SELECT event_type, hv % 64 AS bucket, hv // 64 AS w FROM h
    ),
    r AS (
        SELECT event_type, bucket,
               CASE WHEN w > 0 THEN 26 - length(bin(w)) + 1 ELSE 27 END AS rk
        FROM b
    ),
    reg AS (
        SELECT event_type, bucket, CAST(MAX(rk) AS INT) AS r
        FROM r GROUP BY 1, 2
    ),
    allr AS (
        SELECT 'ALL' AS event_type, bucket, CAST(MAX(r) AS INT) AS r
        FROM reg GROUP BY 2
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, r FROM reg
    UNION ALL
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, r FROM allr
    ORDER BY event_type, bucket
"""

# q140: the oracle replays the funnel as a MIN-after-MIN CTE chain —
# stage k's timestamp is the earliest event of that type STRICTLY
# after the user's stage-(k-1) timestamp, which is exactly what the
# engine's sorted-array fold computes (strict µs increase, so
# equal-timestamp ties cannot double-advance in either form). Counts
# carry explicit BIGINT casts; conversions are exact floor divisions
# with the stage-1 / zero-denominator conventions inlined.
ENGINE_ORACLE_SQL["q140_conversion_funnel"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS eus, event_type
               FROM events),
    s1 AS (SELECT user_id, MIN(eus) AS t FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.eus) AS t FROM e JOIN s1 USING (user_id)
           WHERE e.event_type = 'view' AND e.eus > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.eus) AS t FROM e JOIN s2 USING (user_id)
           WHERE e.event_type = 'click' AND e.eus > s2.t GROUP BY e.user_id),
    s4 AS (SELECT e.user_id, MIN(e.eus) AS t FROM e JOIN s3 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.eus > s3.t
           GROUP BY e.user_id),
    n AS (
        SELECT 1 AS stage, 'signup' AS stage_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
        UNION ALL SELECT 2, 'view',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
        UNION ALL SELECT 3, 'click',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
        UNION ALL SELECT 4, 'purchase',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s4)
    ),
    x AS (
        SELECT stage, stage_name, n_users,
               FIRST_VALUE(n_users) OVER (ORDER BY stage) AS top,
               LAG(n_users) OVER (ORDER BY stage) AS prev
        FROM n
    )
    SELECT CAST(stage AS INT) AS stage, stage_name, n_users,
           CASE WHEN top > 0 THEN (1000000 * n_users) // top
                ELSE 0 END AS conv_top_e6,
           CASE WHEN stage = 1 THEN 1000000
                WHEN prev > 0 THEN (1000000 * n_users) // prev
                ELSE 0 END AS conv_prev_e6
    FROM x ORDER BY stage
"""

# q141: the oracle replays the degree-ordered wedge count with the
# identical κ = degree·1e10 + node total order (every decision an
# integer comparison, so both engines generate each triangle exactly
# once at its κ-minimal vertex). The edge and oriented-edge CTEs are
# MATERIALIZED — they are referenced 2–3× and DuckDB re-inlines plain
# CTEs per reference (the q139 lesson).
ENGINE_ORACLE_SQL["q141_triangle_parts"] = """
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.p AS x, b.p AS y FROM op a JOIN op b
        ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    deg AS MATERIALIZED (
        SELECT n, COUNT(*) AS d FROM (
            SELECT x AS n FROM e UNION ALL SELECT y FROM e)
        GROUP BY n),
    o AS MATERIALIZED (
        SELECT CASE WHEN kx < ky THEN x ELSE y END AS src,
               CASE WHEN kx < ky THEN y ELSE x END AS dst,
               GREATEST(kx, ky) AS kdst
        FROM (SELECT e.x, e.y,
                     da.d * 10000000000 + e.x AS kx,
                     db.d * 10000000000 + e.y AS ky
              FROM e JOIN deg da ON da.n = e.x
                     JOIN deg db ON db.n = e.y)),
    tri AS MATERIALIZED (
        SELECT w.src AS a, w.b, w.c
        FROM (SELECT o1.src, o1.dst AS b, o2.dst AS c
              FROM o o1 JOIN o o2
              ON o1.src = o2.src AND o1.kdst < o2.kdst) w
        JOIN o ON o.src = w.b AND o.dst = w.c),
    part AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node),
    top AS (
        SELECT CAST(node AS BIGINT) AS part_key, n_triangles,
               ROW_NUMBER() OVER (ORDER BY n_triangles DESC,
                                  node ASC) AS rn
        FROM part)
    SELECT part_key, n_triangles FROM top WHERE rn <= 20
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           CAST(COALESCE(SUM(n_triangles), 0) // 3 AS BIGINT)
    FROM part
    ORDER BY part_key
"""

# q142: list_reduce over the (eus, event_id)-ordered value list with
# the identical non-negative recurrence (3s + v) // 4 — truncating ≡
# floor for the non-negative numerator, so both engines walk the same
# integer sequence.
ENGINE_ORACLE_SQL["q142_ewma_baseline"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS eus, event_id,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events),
    s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               list(v ORDER BY eus, event_id) AS vs
        FROM v GROUP BY user_id)
    SELECT user_id, n_obs,
           vs[len(vs)] AS last_v,
           CAST(list_reduce(vs, (s, x) -> (3 * s + x) // 4) AS BIGINT)
               AS ewma
    FROM s ORDER BY user_id
"""

# q143: the oracle replays the distinct-x skyline formulation — grouped
# ymax per x, prefix max over strictly-larger x, survivors where the
# row's y is its x's ymax and that ymax beats the prefix — all exact
# integer comparisons (the tokenizer and the e6 floor division follow
# the corpus conventions).
ENGINE_ORACLE_SQL["q143_pareto_frontier"] = r"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_tokens,
               (1000000 * CAST(len(list_distinct(ws)) AS BIGINT))
                   // CAST(len(ws) AS BIGINT) AS ttr_e6
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS ws
              FROM documents)),
    gx AS (SELECT n_tokens, MAX(ttr_e6) AS ymax FROM t GROUP BY n_tokens),
    s AS (SELECT n_tokens, ymax,
                 MAX(ymax) OVER (ORDER BY n_tokens DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pm
          FROM gx)
    SELECT t.doc_id, t.n_tokens, t.ttr_e6
    FROM t JOIN s USING (n_tokens)
    WHERE t.ttr_e6 = s.ymax AND (s.pm IS NULL OR s.ymax > s.pm)
    ORDER BY t.doc_id
"""

# q144: the oracle is the plain BATCH replay of the same integer EWMA
# (q142's list_reduce shape) — the hash match against the STREAMED
# per-batch continuation folds is the stream ≡ batch contract itself.
ENGINE_ORACLE_SQL["q144_streaming_ewma_state"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS eus, event_id,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events),
    s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               list(v ORDER BY eus, event_id) AS vs
        FROM v GROUP BY user_id)
    SELECT user_id, n_obs,
           vs[len(vs)] AS last_v,
           CAST(list_reduce(vs, (s, x) -> (3 * s + x) // 4) AS BIGINT)
               AS ewma
    FROM s ORDER BY user_id
"""

# q145: one unrolled CTE per synchronous LPA round (the q97/q139
# fixed-round replay shape). und is referenced by every round, so it is
# MATERIALIZED (the q139 lesson: DuckDB re-inlines plain CTEs per
# reference); per-round labels are MATERIALIZED too so the
# window-over-aggregate nesting never stacks. Majority label with
# smallest-label ties = ROW_NUMBER(cnt DESC, label ASC) = 1, exactly
# the Spark window.
ENGINE_ORACLE_SQL["q145_supplier_communities"] = """
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    e AS MATERIALIZED (
        SELECT a.s AS x, b.s AS y
        FROM op a JOIN op b ON a.o = b.o AND a.s < b.s
        GROUP BY a.s, b.s HAVING COUNT(*) >= 2),
    und AS MATERIALIZED (
        SELECT x AS node, y AS nbr FROM e
        UNION ALL SELECT y AS node, x AS nbr FROM e),
    l0 AS MATERIALIZED (
        SELECT DISTINCT node, node AS label FROM und),
    l1 AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT u.node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY u.node
                                      ORDER BY COUNT(*) DESC, l.label ASC)
                       AS rn
            FROM und u JOIN l0 l ON u.nbr = l.node
            GROUP BY u.node, l.label)
        WHERE rn = 1),
    l2 AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT u.node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY u.node
                                      ORDER BY COUNT(*) DESC, l.label ASC)
                       AS rn
            FROM und u JOIN l1 l ON u.nbr = l.node
            GROUP BY u.node, l.label)
        WHERE rn = 1),
    l3 AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT u.node, l.label, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY u.node
                                      ORDER BY COUNT(*) DESC, l.label ASC)
                       AS rn
            FROM und u JOIN l2 l ON u.nbr = l.node
            GROUP BY u.node, l.label)
        WHERE rn = 1)
    SELECT CAST(node AS BIGINT) AS supp_key,
           CAST(label AS BIGINT) AS community
    FROM l3 ORDER BY supp_key
"""


# q146: the oracle is the straight full-domain aggregate — identical
# output proves the MG candidate pruning lossless end-to-end.
ENGINE_ORACLE_SQL["q146_mg_frequent_users"] = """
    WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY user_id),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM events)
    SELECT user_id, n_events FROM c, t
    WHERE n_events * 150 >= total
    ORDER BY user_id
"""


# q147: the oracle rebuilds the same per-user code string with an
# ordered list aggregate and scans it with RE2's regexp_extract_all —
# leftmost-first non-overlapping semantics match Java's for this
# pattern (no alternation, classes exclude the terminator).
ENGINE_ORACLE_SQL["q147_sequence_pattern"] = """
    WITH s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               array_to_string(
                   list(substr(event_type, 1, 1)
                        ORDER BY epoch_us(ts), event_id), '') AS seq
        FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(seq, 'v[^p]*c[^p]*p'))
                AS BIGINT) AS n_conversions
    FROM s
    WHERE len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) >= 1
    ORDER BY user_id
"""


# q148: the oracle is the ONE-SHOT recursive-CTE components over the
# same exact-Jaccard pair set (q42's reach CTE, membership grain) — the
# hash match proves the incremental star-compressed maintenance sound.
def _q148_oracle() -> str:
    from bloomy_etl_spark.operators.llm_queries import _SHINGLES_CTE

    return f"""
    WITH RECURSIVE {_SHINGLES_CTE.strip()},
    p AS (SELECT i, j FROM jac WHERE jaccard >= 0.8),
    e AS (SELECT i AS a, j AS b FROM p UNION SELECT j, i FROM p),
    reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
        WHERE e2.b <> r.a
    ),
    lbl AS (SELECT a AS node, LEAST(a, MIN(b)) AS label
            FROM reach GROUP BY a)
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(label AS BIGINT) AS cluster
    FROM lbl ORDER BY doc_id
    """


ENGINE_ORACLE_SQL["q148_streaming_cluster_state"] = _q148_oracle()


# q149: the oracle replays the identical packed-state CUSUM fold via
# list_reduce with a prepended 0 seed (list_reduce seeds from the first
# element; the prepend gives the engine's explicit zero init). All
# operands stay non-negative BIGINTs, so %, greatest and // agree with
# Spark's %, greatest and DIV bit-for-bit.
ENGINE_ORACLE_SQL["q149_cusum_changepoints"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS eus, event_id,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
               list(v ORDER BY eus, event_id) AS vs
        FROM v GROUP BY user_id),
    f AS (
        SELECT user_id, n_obs,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT), vs),
                   (acc, x) -> CASE
                       WHEN greatest(acc % 1000000000000 + x - 700000,
                                     0) >= 3000000
                       THEN acc - (acc % 1000000000000) + 1000000000000
                       ELSE acc - (acc % 1000000000000)
                            + greatest(acc % 1000000000000 + x - 700000,
                                       0)
                   END) AS st
        FROM s)
    SELECT user_id, n_obs,
           CAST(st // 1000000000000 AS BIGINT) AS n_alerts,
           CAST(st % 1000000000000 AS BIGINT) AS resid
    FROM f ORDER BY user_id
"""


# q150: the oracle spells the same Morton shift/mask sum, ranks with
# one global ROW_NUMBER (fine sequentially; the engine's two-phase
# scan must equal it exactly), cuts files at 500 rows, and re-derives
# the zone maps + scanned flag.
def _q150_oracle() -> str:
    z_terms = " + ".join(
        f"(((xb >> {k}) & 1) << {2 * k + 1}) + (((yb >> {k}) & 1) << {2 * k})"
        for k in range(8)
    )
    return f"""
    WITH e AS (
        SELECT event_id,
               CAST(user_id % 256 AS BIGINT) AS xb,
               CAST(DATEDIFF('day', DATE '2024-01-01',
                             CAST(ts AS DATE)) % 256 AS BIGINT) AS yb
        FROM events),
    z AS (
        SELECT event_id, xb, yb, CAST({z_terms} AS BIGINT) AS z
        FROM e),
    r AS (
        SELECT *, (ROW_NUMBER() OVER (ORDER BY z, event_id) - 1) // 500
                   AS file_id
        FROM z),
    g AS (
        SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(xb) AS x_min, MAX(xb) AS x_max,
               MIN(yb) AS y_min, MAX(yb) AS y_max,
               MIN(z) AS z_min, MAX(z) AS z_max
        FROM r GROUP BY file_id)
    SELECT file_id, n_rows, x_min, x_max, y_min, y_max, z_min, z_max,
           CAST(CASE WHEN x_min <= 47 AND x_max >= 32
                      AND y_min <= 15 AND y_max >= 8
                THEN 1 ELSE 0 END AS BIGINT) AS scanned
    FROM g ORDER BY file_id
    """


ENGINE_ORACLE_SQL["q150_zorder_zonemaps"] = _q150_oracle()


# q151: plain window replay — counts, per-item total, winner by
# (n_wins DESC, label ASC), integer-millionth share.
ENGINE_ORACLE_SQL["q151_vote_consensus"] = """
    WITH c AS (
        SELECT user_id AS item, event_type AS label,
               CAST(COUNT(*) AS BIGINT) AS n_wins
        FROM events GROUP BY user_id, event_type),
    t AS (
        SELECT item, label, n_wins,
               CAST(SUM(n_wins) OVER (PARTITION BY item) AS BIGINT)
                   AS n_votes,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY n_wins DESC, label ASC) AS rn
        FROM c)
    SELECT item, label, n_votes, n_wins,
           (n_wins * 1000000) // n_votes AS share_e6,
           ((n_wins * 1000000) // n_votes) >= 400000 AS decided
    FROM t WHERE rn = 1 ORDER BY item
"""


# q152: the same gaps-and-islands — lag change flag, running-sum run
# number, run-grain aggregate, lead for the exclusive upper bound.
# MIN(state) within a run equals the engine's first(): runs are
# constant in state by construction.
ENGINE_ORACLE_SQL["q152_state_run_history"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS eus, event_id,
               event_type AS state
        FROM events),
    f AS (
        SELECT *, CASE WHEN LAG(state) OVER w IS NULL
                         OR LAG(state) OVER w <> state
                  THEN 1 ELSE 0 END AS chg
        FROM v WINDOW w AS (PARTITION BY user_id ORDER BY eus, event_id)),
    r AS (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id
                                 ORDER BY eus, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS ver
        FROM f),
    g AS (
        SELECT user_id, ver, MIN(state) AS state,
               MIN(eus) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM r GROUP BY user_id, ver)
    SELECT user_id, CAST(ver AS BIGINT) AS version, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
               AS valid_to,
           n_rows
    FROM g ORDER BY user_id, version
"""


# q153: the oracle is the plain BATCH replay of the q149 packed CUSUM
# fold — hashing the STREAMED continuation-fold state against it is
# the stream ≡ batch contract for the alerting path.
ENGINE_ORACLE_SQL["q153_streaming_cusum_state"] = (
    ENGINE_ORACLE_SQL["q149_cusum_changepoints"]
)


# q154: the oracle unrolls the SAME integer MM rounds — e6 strengths,
# e12 per-pair reciprocal terms, floor division on non-negative
# operands everywhere (DuckDB // ≡ Spark DIV there), GREATEST(...,1)
# winless floor. MATERIALIZED per round (the q145 lesson).
def _q154_oracle(rounds: int = 3, scale: int = 1_000_000) -> str:
    sq = scale * scale
    steps = []
    prev = "w0"
    for r in range(1, rounds + 1):
        steps.append(f"""
    d{r} AS MATERIALIZED (
        SELECT s.i, SUM((s.g * {sq}) // (wi.w + wj.w)) AS den
        FROM sym s
        JOIN {prev} wi ON s.i = wi.i
        JOIN {prev} wj ON s.j = wj.i
        GROUP BY s.i),
    w{r} AS MATERIALIZED (
        SELECT it.i, GREATEST((it.n_wins * {sq}) // d{r}.den,
                              CAST(1 AS BIGINT)) AS w
        FROM items it JOIN d{r} ON it.i = d{r}.i)""")
        prev = f"w{r}"
    return f"""
    WITH lb AS MATERIALIZED (
        SELECT l_orderkey AS ok, p_brand AS brand, SUM(l_quantity) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY l_orderkey, p_brand),
    d AS MATERIALIZED (
        SELECT a.brand AS i, b.brand AS j
        FROM lb a JOIN lb b
          ON a.ok = b.ok AND a.brand <> b.brand AND a.q > b.q),
    wins AS (
        SELECT i, CAST(COUNT(*) AS BIGINT) AS n_wins FROM d GROUP BY i),
    g AS (
        SELECT LEAST(i, j) AS a, GREATEST(i, j) AS b,
               CAST(COUNT(*) AS BIGINT) AS g
        FROM d GROUP BY LEAST(i, j), GREATEST(i, j)),
    sym AS MATERIALIZED (
        SELECT a AS i, b AS j, g FROM g
        UNION ALL SELECT b AS i, a AS j, g FROM g),
    items AS MATERIALIZED (
        SELECT s.i, CAST(COALESCE(w.n_wins, 0) AS BIGINT) AS n_wins
        FROM (SELECT DISTINCT i FROM sym) s LEFT JOIN wins w USING (i)),
    w0 AS MATERIALIZED (
        SELECT i, CAST({scale} AS BIGINT) AS w FROM items),{",".join(steps)}
    SELECT it.i AS item, it.n_wins,
           gg.n_games, CAST({prev}.w AS BIGINT) AS strength_e6
    FROM items it
    JOIN (SELECT i, CAST(SUM(g) AS BIGINT) AS n_games
          FROM sym GROUP BY i) gg ON it.i = gg.i
    JOIN {prev} ON it.i = {prev}.i
    ORDER BY item
    """


ENGINE_ORACLE_SQL["q154_bradley_terry"] = _q154_oracle()


# q155: one unrolled MATERIALIZED CTE pair per peel round (survivors,
# pruned edges) — the q145 shape; converged certifies the fixed point
# via a scalar min-degree subquery.
def _q155_oracle(k: int = 3, rounds: int = 6) -> str:
    steps = []
    prev = "e0"
    for r in range(1, rounds + 1):
        steps.append(f"""
    s{r} AS MATERIALIZED (
        SELECT node FROM (
            SELECT node, COUNT(*) AS deg
            FROM (SELECT x AS node FROM {prev}
                  UNION ALL SELECT y AS node FROM {prev})
            GROUP BY node)
        WHERE deg >= {k}),
    e{r} AS MATERIALIZED (
        SELECT x, y FROM {prev}
        WHERE x IN (SELECT node FROM s{r})
          AND y IN (SELECT node FROM s{r}))""")
        prev = f"e{r}"
    return f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    e0 AS MATERIALIZED (
        SELECT a.s AS x, b.s AS y
        FROM op a JOIN op b ON a.o = b.o AND a.s < b.s
        GROUP BY a.s, b.s HAVING COUNT(*) >= 2),{",".join(steps)},
    fin AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT x AS node FROM {prev}
              UNION ALL SELECT y AS node FROM {prev})
        GROUP BY node)
    SELECT CAST(node AS BIGINT) AS supp_key, degree,
           (SELECT COALESCE(MIN(degree), {k}) FROM fin) >= {k}
               AS converged
    FROM fin ORDER BY supp_key
    """


ENGINE_ORACLE_SQL["q155_supplier_kcore"] = _q155_oracle()


# q156: the oracle is the plain batch gaps-and-islands compaction
# (q152's SQL) — hashing the streamed open-run-merged interval table
# against it is the stream ≡ batch contract for dimension maintenance.
ENGINE_ORACLE_SQL["q156_streaming_scd2_state"] = (
    ENGINE_ORACLE_SQL["q152_state_run_history"]
)


# q158: the oracle is q154's one-shot integer MM fit — hashing the
# leaderboard re-fit from STREAMED count deltas against it is the
# stream ≡ batch contract (counts are additive, so any batch slicing
# must land on the identical fit).
ENGINE_ORACLE_SQL["q158_streaming_leaderboard"] = (
    ENGINE_ORACLE_SQL["q154_bradley_terry"]
)


# q159: the oracle replays MERGE as the textbook FULL OUTER JOIN +
# CASE — delete clause first (matched & sn < 5 rows drop), counters
# add on match, source-only rows insert, target-only pass through.
ENGINE_ORACLE_SQL["q159_merge_upsert"] = """
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events),
    t AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(v) AS BIGINT) AS v_sum_e4
        FROM ev WHERE d < DATE '2024-01-16' AND user_id % 2 = 0
        GROUP BY user_id),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(v) AS BIGINT) AS v_sum_e4
        FROM ev WHERE d >= DATE '2024-01-16'
        GROUP BY user_id),
    j AS (
        SELECT COALESCE(t.user_id, s.user_id) AS user_id,
               t.user_id IS NOT NULL AS te, s.user_id IS NOT NULL AS se,
               t.n_events AS tn, t.v_sum_e4 AS tv,
               s.n_events AS sn, s.v_sum_e4 AS sv
        FROM t FULL OUTER JOIN s ON t.user_id = s.user_id)
    SELECT user_id,
           CAST(CASE WHEN te AND se THEN tn + sn
                     WHEN te THEN tn ELSE sn END AS BIGINT) AS n_events,
           CAST(CASE WHEN te AND se THEN tv + sv
                     WHEN te THEN tv ELSE sv END AS BIGINT) AS v_sum_e4
    FROM j
    WHERE NOT (te AND se AND sn < 5)
    ORDER BY user_id
"""


# q160: identical lead-window LOCF weighting — widths quantized to ms
# by floor division (non-negative, so // ≡ DIV), area and width sums
# exact BIGINTs, zero-width keys fall back to the last value in order.
ENGINE_ORACLE_SQL["q160_time_weighted_avg"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS eus, event_id,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events),
    led AS (
        SELECT user_id, eus, event_id, v,
               COALESCE(LEAD(eus) OVER w - eus, 0) // 1000 AS wms
        FROM v WINDOW w AS (PARTITION BY user_id
                            ORDER BY eus, event_id)),
    g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(MAX(eus) - MIN(eus) AS BIGINT) AS span_us,
               CAST(SUM(wms) AS BIGINT) AS wsum,
               CAST(SUM(v * wms) AS BIGINT) AS area,
               CAST(LAST(v ORDER BY eus, event_id) AS BIGINT) AS lastv
        FROM led GROUP BY user_id)
    SELECT user_id, n_obs, span_us,
           CAST(CASE WHEN wsum > 0 THEN area // wsum
                ELSE lastv END AS BIGINT) AS twa
    FROM g ORDER BY user_id
"""


# q161: per-slice replay of the q150 Morton sum + sequential rank
# partitioned by slice (batch), 500-row cuts, file-grain min/max.
def _q161_oracle() -> str:
    z_terms = " + ".join(
        f"(((xb >> {k}) & 1) << {2 * k + 1}) + (((yb >> {k}) & 1) << {2 * k})"
        for k in range(8)
    )
    return f"""
    WITH e AS (
        SELECT event_id, event_id % 3 AS batch_id,
               CAST(user_id % 256 AS BIGINT) AS xb,
               CAST(DATEDIFF('day', DATE '2024-01-01',
                             CAST(ts AS DATE)) % 256 AS BIGINT) AS yb
        FROM events),
    z AS (
        SELECT event_id, batch_id, xb, yb,
               CAST({z_terms} AS BIGINT) AS z
        FROM e),
    r AS (
        SELECT *, (ROW_NUMBER() OVER (PARTITION BY batch_id
                                      ORDER BY z, event_id) - 1) // 500
                   AS file_id
        FROM z),
    g AS (
        SELECT CAST(batch_id AS BIGINT) AS batch_id, file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(xb) AS x_min, MAX(xb) AS x_max,
               MIN(yb) AS y_min, MAX(yb) AS y_max,
               MIN(z) AS z_min, MAX(z) AS z_max
        FROM r GROUP BY batch_id, file_id)
    SELECT file_id, n_rows, x_min, x_max, y_min, y_max, z_min, z_max,
           batch_id
    FROM g ORDER BY batch_id, file_id
    """


ENGINE_ORACLE_SQL["q161_streaming_zonemaps"] = _q161_oracle()


# q162: identical packed-MAX LOCF — eus·10+code over the user frame,
# 7-day window test, click-over-view at an instant via the code order.
ENGINE_ORACLE_SQL["q162_touch_attribution"] = """
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS eus, event_id, event_type
        FROM events),
    t AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'view' THEN eus * 10 + 1
                        WHEN event_type = 'click' THEN eus * 10 + 2
                   END) OVER (PARTITION BY user_id
                              ORDER BY eus, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS lt
        FROM v)
    SELECT event_id AS purchase_id, user_id, eus AS purchase_eus,
           CASE WHEN lt IS NOT NULL
                 AND eus - lt // 10 <= 604800000000
                THEN lt // 10 END AS touch_eus,
           CASE WHEN lt IS NOT NULL
                 AND eus - lt // 10 <= 604800000000
                THEN (CASE WHEN lt % 10 = 2 THEN 'click' ELSE 'view' END)
                ELSE 'direct' END AS channel,
           CAST(CASE WHEN lt IS NOT NULL
                      AND eus - lt // 10 <= 604800000000
                THEN eus - lt // 10 END AS BIGINT) AS lag_us
    FROM t
    WHERE event_type = 'purchase'
    ORDER BY purchase_id
"""


# q163: one unrolled relaxation CTE per round over the symmetric
# weighted edges — integer min path costs, the k-core/LPA replay shape.
def _q163_oracle(rounds: int = 4) -> str:
    steps = []
    prev = "d0"
    for r in range(1, rounds + 1):
        steps.append(f"""
    d{r} AS MATERIALIZED (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.w AS dist
            FROM {prev} d JOIN sym e ON d.node = e.src)
        GROUP BY node)""")
        prev = f"d{r}"
    return f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    und AS MATERIALIZED (
        SELECT a.s AS x, b.s AS y,
               CAST(1000000 AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS w
        FROM op a JOIN op b ON a.o = b.o AND a.s < b.s
        GROUP BY a.s, b.s),
    sym AS MATERIALIZED (
        SELECT x AS src, y AS dst, w FROM und
        UNION ALL SELECT y AS src, x AS dst, w FROM und),
    d0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
        FROM sym WHERE src % 20 = 0),{",".join(steps)}
    SELECT CAST(node AS BIGINT) AS supp_key, CAST(dist AS BIGINT) AS dist
    FROM {prev} ORDER BY supp_key
    """


ENGINE_ORACLE_SQL["q163_weighted_proximity"] = _q163_oracle()


# q164: same two aggs, same single-division exact rationals.
ENGINE_ORACLE_SQL["q164_mixture_diversity"] = """
    WITH sl AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source, lang),
    g AS (
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               CAST(SUM(n * n) AS BIGINT) AS s
        FROM sl GROUP BY source)
    SELECT source, n_docs, n_langs,
           (s * 1000000) // (n_docs * n_docs) AS simpson_e6,
           CAST(1000000 - (s * 1000000) // (n_docs * n_docs) AS BIGINT)
               AS gini_e6,
           (n_docs * n_docs * 1000) // s AS eff_langs_e3
    FROM g ORDER BY source
"""


# q165: the oracle is the one-shot batch attribution (q162's SQL) —
# the hash match is the emitted-facts-are-final contract across seams.
ENGINE_ORACLE_SQL["q165_streaming_attribution"] = (
    ENGINE_ORACLE_SQL["q162_touch_attribution"]
)


# q166: same portable hash, same k-min ranking, same integer
# estimator and error division.
ENGINE_ORACLE_SQL["q166_sketch_accuracy"] = """
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   AS hv
        FROM events WHERE user_id IS NOT NULL),
    r AS (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY hv) AS rn
        FROM h),
    sk AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz,
               MAX(hv) AS hk
        FROM r WHERE rn <= 64 GROUP BY event_type),
    ex AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY event_type)
    SELECT s.event_type, e.n_exact,
           CAST(CASE WHEN s.sz < 64 THEN s.sz
                ELSE (63 * 4294967296) // GREATEST(s.hk, 1)
                END AS BIGINT) AS n_est,
           CAST(ABS(CASE WHEN s.sz < 64 THEN s.sz
                    ELSE (63 * 4294967296) // GREATEST(s.hk, 1) END
                    - e.n_exact) * 1000000 // e.n_exact AS BIGINT)
               AS err_e6
    FROM sk s JOIN ex e ON s.event_type = e.event_type
    ORDER BY s.event_type
"""


# q167: one sequential window replays the sweep (fine for an oracle);
# the engine's two-phase day-bucketed scan must land on the identical
# running balance, peaks grouped per day.
ENGINE_ORACLE_SQL["q167_peak_concurrency"] = """
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS eus FROM events),
    f AS (
        SELECT *, CASE WHEN LAG(eus) OVER w IS NULL
                         OR eus - LAG(eus) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id
                            ORDER BY eus, event_id)),
    r AS (
        SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                 ORDER BY eus, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sess
        FROM f),
    sess AS (
        SELECT user_id, sess, MIN(eus) AS s_eus, MAX(eus) + 1 AS e_eus
        FROM r GROUP BY user_id, sess),
    b AS (
        SELECT s_eus AS eus, CAST(1 AS BIGINT) AS delta FROM sess
        UNION ALL
        SELECT e_eus AS eus, CAST(-1 AS BIGINT) AS delta FROM sess),
    sweep AS (
        SELECT eus // 86400000000 AS day,
               SUM(delta) OVER (ORDER BY eus, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc
        FROM b)
    SELECT CAST(day AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_boundaries,
           CAST(MAX(conc) AS BIGINT) AS peak_sessions
    FROM sweep GROUP BY day ORDER BY day
"""


# q168: same day-user dedupe + window-contribution explode; the
# stickiness division is a single integer DIV.
ENGINE_ORACLE_SQL["q168_rolling_actives"] = """
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
        FROM events),
    c AS (
        SELECT day + d AS wday, user_id
        FROM du, (SELECT UNNEST(range(0, 7)) AS d)),
    wau AS (
        SELECT wday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM c GROUP BY wday),
    dau AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM du GROUP BY day)
    SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, wau.wau,
           (dau.dau * 1000000) // wau.wau AS stickiness_e6
    FROM dau JOIN wau ON dau.day = wau.wday
    ORDER BY day
"""

# q169: identical sorted list + nearest-rank ceil indexing (1-based
# in both engines).
ENGINE_ORACLE_SQL["q169_percentile_grid"] = """
    WITH v AS (
        SELECT event_type, CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events),
    g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               list(v ORDER BY v) AS vs
        FROM v GROUP BY event_type)
    SELECT event_type, n,
           vs[CAST((10 * n + 99) // 100 AS INT)] AS p10_e4,
           vs[CAST((50 * n + 99) // 100 AS INT)] AS p50_e4,
           vs[CAST((90 * n + 99) // 100 AS INT)] AS p90_e4
    FROM g ORDER BY event_type
"""


# q170: the oracle IS the same SQL text — one source of truth.
ENGINE_ORACLE_SQL["q170_subquery_pack"] = _Q170_SQL


# q171: the q148 pair CTE joined to the q47 split replay; only
# cross-split pairs survive.
def _q171_oracle() -> str:
    from bloomy_etl_spark.operators.llm_queries import _SHINGLES_CTE

    return f"""
    WITH {_SHINGLES_CTE.strip()},
    p AS (SELECT i, j FROM jac WHERE jaccard >= 0.8),
    sp AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5('split:'
                          || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                         % 100 < 60 THEN 'train'
                    WHEN ('0x' || substr(md5('split:'
                          || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                         % 100 < 80 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT p.i, p.j, a.split AS split_i, b.split AS split_j
    FROM p JOIN sp a ON p.i = a.doc_id
           JOIN sp b ON p.j = b.doc_id
    WHERE a.split <> b.split
    ORDER BY p.i, p.j
    """


ENGINE_ORACLE_SQL["q171_split_leakage"] = _q171_oracle()


# q172: per-edge NOT EXISTS replays of the same anti-joins.
ENGINE_ORACLE_SQL["q172_referential_audit"] = """
    SELECT 'orders.o_custkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders c
            WHERE NOT EXISTS (SELECT 1 FROM customer p
                              WHERE p.c_custkey = c.o_custkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.o_custkey) AS BIGINT) FROM orders c
            WHERE NOT EXISTS (SELECT 1 FROM customer p
                              WHERE p.c_custkey = c.o_custkey)) AS n_orphan_keys
    UNION ALL
    SELECT 'lineitem.l_orderkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem c
            WHERE NOT EXISTS (SELECT 1 FROM orders p
                              WHERE p.o_orderkey = c.l_orderkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.l_orderkey) AS BIGINT) FROM lineitem c
            WHERE NOT EXISTS (SELECT 1 FROM orders p
                              WHERE p.o_orderkey = c.l_orderkey)) AS n_orphan_keys
    UNION ALL
    SELECT 'lineitem.l_partkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem c
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = c.l_partkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.l_partkey) AS BIGINT) FROM lineitem c
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = c.l_partkey)) AS n_orphan_keys
    UNION ALL
    SELECT 'lineitem.l_suppkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem c
            WHERE NOT EXISTS (SELECT 1 FROM supplier p
                              WHERE p.s_suppkey = c.l_suppkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.l_suppkey) AS BIGINT) FROM lineitem c
            WHERE NOT EXISTS (SELECT 1 FROM supplier p
                              WHERE p.s_suppkey = c.l_suppkey)) AS n_orphan_keys
    UNION ALL
    SELECT 'customer.c_nationkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation p
                              WHERE p.n_nationkey = c.c_nationkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation p
                              WHERE p.n_nationkey = c.c_nationkey)) AS n_orphan_keys
    UNION ALL
    SELECT 'supplier.s_nationkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier c
            WHERE NOT EXISTS (SELECT 1 FROM nation p
                              WHERE p.n_nationkey = c.s_nationkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.s_nationkey) AS BIGINT) FROM supplier c
            WHERE NOT EXISTS (SELECT 1 FROM nation p
                              WHERE p.n_nationkey = c.s_nationkey)) AS n_orphan_keys
    UNION ALL
    SELECT 'nation.n_regionkey' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nation c
            WHERE NOT EXISTS (SELECT 1 FROM region p
                              WHERE p.r_regionkey = c.n_regionkey)) AS n_orphans,
           (SELECT CAST(COUNT(DISTINCT c.n_regionkey) AS BIGINT) FROM nation c
            WHERE NOT EXISTS (SELECT 1 FROM region p
                              WHERE p.r_regionkey = c.n_regionkey)) AS n_orphan_keys
    ORDER BY fk
"""


# q173: the oracle is q168's batch engagement SQL — set-union
# confluence makes the streamed readout provably identical; the hash
# gate checks it anyway.
ENGINE_ORACLE_SQL["q173_streaming_engagement"] = (
    ENGINE_ORACLE_SQL["q168_rolling_actives"]
)


# q174: identical day/type-grain windows and integer shares.
ENGINE_ORACLE_SQL["q174_contribution_analysis"] = """
    WITH dt AS (
        SELECT epoch_us(ts) // 86400000000 AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY day, event_type),
    d AS (
        SELECT day, CAST(SUM(n) AS BIGINT) AS n_total
        FROM dt GROUP BY day),
    days AS (
        SELECT day, n_total,
               ((n_total - pv) * 1000000) // pv AS delta_e6
        FROM (SELECT day, n_total,
                     LAG(n_total) OVER (ORDER BY day) AS pv
              FROM d)
        WHERE pv IS NOT NULL
          AND ABS((n_total - pv) * 1000000 // pv) >= 20000),
    sh AS (
        SELECT dt.day, dt.event_type,
               (dt.n * 1000000) // d.n_total AS share_e6
        FROM dt JOIN d ON dt.day = d.day),
    sf AS (
        SELECT day, event_type,
               ABS(share_e6 - ps) AS shift_e6
        FROM (SELECT day, event_type, share_e6,
                     LAG(share_e6) OVER (PARTITION BY event_type
                                         ORDER BY day) AS ps
              FROM sh)
        WHERE ps IS NOT NULL),
    top AS (
        SELECT day, event_type AS top_type, shift_e6
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY day
                       ORDER BY shift_e6 DESC, event_type ASC) AS rn
              FROM sf)
        WHERE rn = 1)
    SELECT CAST(days.day AS BIGINT) AS day, days.n_total,
           CAST(days.delta_e6 AS BIGINT) AS delta_e6,
           top.top_type, CAST(top.shift_e6 AS BIGINT) AS shift_e6
    FROM days JOIN top ON days.day = top.day
    ORDER BY day
"""


# q175: per-table one-agg replays.
ENGINE_ORACLE_SQL["q175_catalog_stats"] = """
    SELECT 'region' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT r_regionkey) AS BIGINT) AS key_ndv,
           CAST(MIN(r_regionkey) AS BIGINT) AS key_min,
           CAST(MAX(r_regionkey) AS BIGINT) AS key_max
    FROM region
    UNION ALL
    SELECT 'nation' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS key_ndv,
           CAST(MIN(n_nationkey) AS BIGINT) AS key_min,
           CAST(MAX(n_nationkey) AS BIGINT) AS key_max
    FROM nation
    UNION ALL
    SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS key_ndv,
           CAST(MIN(c_custkey) AS BIGINT) AS key_min,
           CAST(MAX(c_custkey) AS BIGINT) AS key_max
    FROM customer
    UNION ALL
    SELECT 'supplier' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS key_ndv,
           CAST(MIN(s_suppkey) AS BIGINT) AS key_min,
           CAST(MAX(s_suppkey) AS BIGINT) AS key_max
    FROM supplier
    UNION ALL
    SELECT 'part' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS key_ndv,
           CAST(MIN(p_partkey) AS BIGINT) AS key_min,
           CAST(MAX(p_partkey) AS BIGINT) AS key_max
    FROM part
    UNION ALL
    SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS key_ndv,
           CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
           CAST(MAX(o_orderkey) AS BIGINT) AS key_max
    FROM orders
    UNION ALL
    SELECT 'lineitem' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS key_ndv,
           CAST(MIN(l_orderkey) AS BIGINT) AS key_min,
           CAST(MAX(l_orderkey) AS BIGINT) AS key_max
    FROM lineitem
    UNION ALL
    SELECT 'events' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS key_ndv,
           CAST(MIN(event_id) AS BIGINT) AS key_min,
           CAST(MAX(event_id) AS BIGINT) AS key_max
    FROM events
    UNION ALL
    SELECT 'documents' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS key_ndv,
           CAST(MIN(doc_id) AS BIGINT) AS key_min,
           CAST(MAX(doc_id) AS BIGINT) AS key_max
    FROM documents
    UNION ALL
    SELECT 'embeddings' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS key_ndv,
           CAST(MIN(vec_id) AS BIGINT) AS key_min,
           CAST(MAX(vec_id) AS BIGINT) AS key_max
    FROM embeddings
    ORDER BY tbl
"""
