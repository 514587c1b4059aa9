"""Property-based tests (SURVEY.md §5.2.3): clip idempotence/bounds,
mask monotonicity, merge permutation-invariance, skew-safe pair
generation vs brute force, n-gram Jaccard vs brute force.

Hypothesis drives the data; each example is one small local Spark job,
so max_examples stays modest and deadlines are off (JVM scheduling
jitter would otherwise flake)."""

from __future__ import annotations

import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bloomy_etl_spark.functions.indices import (
    DEFAULT_QUALITY,
    QualityThresholds,
    clip,
    with_indices,
    with_masks,
)
from bloomy_etl_spark.operators.dedup import bucket_pairs, ngram_jaccard_pairs
from bloomy_etl_spark.operators.merge import merge_all

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(
    min_value=-50.0, max_value=50.0, allow_nan=False, allow_infinity=False
)


@given(vals=st.lists(finite, min_size=1, max_size=40))
@settings(**SETTINGS)
def test_clip_idempotent_and_bounded(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = df.select(
        clip(F.col("v"), -1.0, 1.0).alias("c1"),
        clip(clip(F.col("v"), -1.0, 1.0), -1.0, 1.0).alias("c2"),
        "v",
    ).collect()
    for r in out:
        assert -1.0 <= r["c1"] <= 1.0
        assert r["c1"] == r["c2"], "clip must be idempotent"
        if -1.0 <= r["v"] <= 1.0:
            assert r["c1"] == r["v"], "in-range values pass through"


band = st.one_of(st.none(), st.integers(min_value=-500, max_value=12000))
pixel = st.tuples(
    band, band, band, st.one_of(st.none(), st.integers(min_value=0, max_value=255))
)


@given(pixels=st.lists(pixel, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_mask_monotone_and_is_component_or(spark, pixels):
    """Adding a mask component never increases the valid count, and the
    combined mask is exactly the OR of its components (F11)."""
    df = spark.createDataFrame(
        [(float(r) if r is not None else None,
          float(n) if n is not None else None,
          float(b) if b is not None else None,
          f) for r, n, b, f in pixels],
        "red double, nir double, blue double, fmask int",
    )
    no_haze = QualityThresholds(blue_haze=float("1e18"))  # haze disabled
    rows = with_masks(df).collect()
    relaxed = with_masks(df, no_haze).collect()
    comp = ["outside", "cloud_shadow", "anomaly_low", "anomaly_high", "haze",
            "invalid_ndvi"]
    for r in rows:
        assert r["mask"] == any(r[c] for c in comp)
    n_valid = sum(not r["mask"] for r in rows)
    n_valid_relaxed = sum(not r["mask"] for r in relaxed)
    assert n_valid <= n_valid_relaxed


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["T01", "T02"]),               # tile_id
            st.integers(min_value=0, max_value=2),         # day
            st.integers(min_value=0, max_value=1),         # intra-day hour
            st.integers(min_value=0, max_value=2),         # y
            st.integers(min_value=0, max_value=2),         # x
            st.one_of(st.none(), finite),                  # ndvi
        ),
        min_size=1,
        max_size=25,
    ),
    seed=st.randoms(use_true_random=False),
)
@settings(**SETTINGS)
def test_merge_all_permutation_invariant(spark, rows, seed):
    """merge_all output must not depend on input row order — the reference
    sorts its dataset list explicitly (core/merger.py:25,69,104); the
    relational form must be order-free by construction."""
    def df_of(rs):
        data = [
            (t, f"2024-06-{d + 1:02d} {10 + h}:00:00", y, x, v,
             v / 2 if v is not None else None)
            for t, d, h, y, x, v in rs
        ]
        return spark.createDataFrame(
            data, "tile_id string, time string, y int, x int, ndvi double, evi double"
        ).withColumn("time", F.col("time").cast("timestamp"))

    shuffled = list(rows)
    seed.shuffle(shuffled)

    def canon(df):
        out = []
        for r in merge_all(df).collect():
            out.append(
                (str(r["time"]), r["y"], r["x"],
                 None if r["ndvi"] is None else round(r["ndvi"], 9),
                 None if r["evi"] is None else round(r["evi"], 9),
                 r["num_granules_merged"])
            )
        return sorted(out, key=str)

    assert canon(df_of(rows)) == canon(df_of(shuffled))


@given(
    n_members=st.integers(min_value=2, max_value=120),
    cap=st.integers(min_value=2, max_value=16),
)
@settings(**SETTINGS)
def test_bucket_pairs_exhaustive_no_dup(spark, n_members, cap):
    """The skew-safe chunked path must emit exactly the C(n,2) i<j pairs —
    no gaps, no duplicates — for any bucket size and chunk cap."""
    members = list(range(n_members))
    df = spark.createDataFrame([(members,)], "ms array<int>")
    got = sorted(
        (r["a"], r["b"]) for r in bucket_pairs(df, cap=cap).collect()
    )
    want = sorted(itertools.combinations(members, 2))
    assert got == want


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])


@given(
    docs=st.lists(
        st.lists(words, min_size=3, max_size=8), min_size=2, max_size=8
    ),
    threshold=st.sampled_from([0.1, 0.5, 0.9]),
)
@settings(**SETTINGS)
def test_ngram_jaccard_matches_bruteforce(spark, docs, threshold):
    n = 2
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=n, threshold=threshold).collect()
    }
    shingles = [
        {" ".join(ws[k:k + n]) for k in range(len(ws) - n + 1)} for ws in docs
    ]
    want = {}
    for i, j in itertools.combinations(range(len(docs)), 2):
        inter = len(shingles[i] & shingles[j])
        if inter == 0:
            continue
        jac = inter / len(shingles[i] | shingles[j])
        if jac >= threshold:
            want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=1e-9)


@given(vals=st.lists(st.one_of(st.none(), finite), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_masked_indices_never_out_of_range(spark, vals):
    """After with_indices, every non-NULL ndvi ∈ [-1,1] and evi ∈ [-3,3]
    regardless of band values (P4+P5 composition)."""
    data = [
        (v, None if v is None else v * 3 + 50.0, 10.0, 0) for v in vals
    ]
    df = spark.createDataFrame(
        data, "red double, nir double, blue double, fmask int"
    )
    out = with_indices(with_masks(df)).collect()
    for r in out:
        if r["ndvi"] is not None:
            assert -1.0 <= r["ndvi"] <= 1.0
        if r["evi"] is not None:
            assert -3.0 <= r["evi"] <= 3.0


def test_bucket_pairs_carry_passthrough(spark):
    """``carry`` columns must ride along unchanged on BOTH expansion paths
    (in-row small buckets and the chunked hot-bucket path)."""
    df = spark.createDataFrame(
        [(7, list(range(3))), (9, list(range(10)))], "key int, ms array<int>"
    )
    rows = bucket_pairs(df, cap=4, carry=("key",)).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append((r["a"], r["b"]))
    assert sorted(by_key[7]) == sorted(itertools.combinations(range(3), 2))
    assert sorted(by_key[9]) == sorted(itertools.combinations(range(10), 2))


def test_word_shingles_edges(spark):
    """Shingling edge semantics: short docs collapse to one joined-token
    shingle; exactly-n docs give one shingle; repeats dedupe but keep
    first-occurrence order."""
    from bloomy_etl_spark.functions.text import word_shingles

    df = spark.createDataFrame(
        [("one",), ("two words",), ("a b c",), ("x y x y x y",)], "text string"
    )
    got = [r[0] for r in df.select(word_shingles(F.col("text"), 3)).collect()]
    assert got == [
        ["one"],
        ["two words"],
        ["a b c"],
        ["x y x", "y x y"],
    ]


# --------------------------------------------------------------------------
# corpus-assembly properties: sessionize vs a pure-Python reference,
# packing conservation under arbitrary token profiles
# --------------------------------------------------------------------------

event_times = st.lists(
    st.integers(min_value=0, max_value=3_000_000),  # µs offsets in ~50 min
    min_size=1,
    max_size=25,
)


@given(
    times_by_user=st.dictionaries(
        st.integers(min_value=1, max_value=4), event_times, min_size=1, max_size=4
    ),
    gap_s_h=st.integers(min_value=1, max_value=2),
)
@settings(**SETTINGS)
def test_sessionize_matches_python_reference(spark, times_by_user, gap_s_h):
    """sessionize == the obvious sequential scan: sort each user's event
    times, break when the delta exceeds the gap strictly. The gap is
    whole SECONDS — sessionize's contract is gap_s: int, and a fractional
    float gap would round (gap_s*1e6) away from the integer reference at
    exact-gap boundaries."""
    import datetime

    from bloomy_etl_spark.operators.corpus import sessionize

    gap_us = gap_s_h * 1_000_000
    base = datetime.datetime(2024, 1, 1)
    rows, want = [], {}
    eid = 0
    for user, offs in times_by_user.items():
        seq = 0
        prev = None
        for off in sorted(offs):
            # event ids ordered within (user, ts) so ties are deterministic
            if prev is None or off - prev > gap_us:
                seq += 1
            rows.append((user, base + datetime.timedelta(microseconds=off), eid))
            want[eid] = seq
            prev = off
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    gap_s = gap_s_h
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, gap_s=gap_s).collect()
    }
    assert got == want


@given(
    toks=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=4096),
)
@settings(**SETTINGS)
def test_pack_sequences_matches_python_reference(spark, toks, budget):
    """pack_sequences == the sequential first-fit-with-overflow packer:
    doc i opens in bin floor(sum(tokens before i) / budget)."""
    from collections import defaultdict

    from bloomy_etl_spark.operators.corpus import pack_sequences

    # build texts whose bpe_ish_token_count == the requested token count:
    # 'a' * (4 * n) has no punctuation and one word -> max(1, ceil(len/4)) = n
    rows = [("x", i, "a" * (4 * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    got = {
        (r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in pack_sequences(df, budget=budget).collect()
    }
    bins = defaultdict(lambda: [0, 0])
    cum = 0
    for n in toks:
        b = cum // budget
        bins[b][0] += 1
        bins[b][1] += n
        cum += n
    want = {b: tuple(v) for b, v in bins.items()}
    assert got == want


words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=120
)


@given(ws=words, window=st.integers(4, 60), stride_frac=st.integers(1, 4))
@settings(**SETTINGS)
def test_chunking_covers_every_token_exactly(spark, ws, window, stride_frac):
    """Chunk windows tile the token range: first starts at 0, last ends at
    n_tok, consecutive starts advance by exactly the stride, and every
    chunk's length is in (0, window]."""
    from bloomy_etl_spark.operators.corpus import chunk_documents

    stride = max(1, window // stride_frac)
    docs = spark.createDataFrame([(1, " ".join(ws))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(docs, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    n_tok = rows[0]["n_tok"]
    assert rows[0]["chunk_start"] == 0
    assert rows[-1]["chunk_start"] + rows[-1]["chunk_len"] == n_tok
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["chunk_start"] - prev["chunk_start"] == stride
    for r in rows:
        assert 0 < r["chunk_len"] <= window
    # chunk count formula: 1 + ceil(max(0, n_tok - window) / stride)
    want = 1 + max(0, -(-(max(n_tok - window, 0)) // stride))
    assert len(rows) == want


@given(
    sizes=st.lists(st.integers(1, 40), min_size=2, max_size=5),
    alpha=st.floats(0.1, 1.0, allow_nan=False),
)
@settings(**SETTINGS)
def test_mixture_rates_flatten_monotonically(spark, sizes, alpha):
    """Larger groups never get a larger keep rate, the smallest group's
    rate is exactly 1, and alpha=1 would keep everything."""
    from bloomy_etl_spark.operators.corpus import mixture_sample

    rows = [
        (g * 1000 + i, "txt", f"g{g}")
        for g, n in enumerate(sizes)
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {
        r["lang"]: r["keep_rate"]
        for r in mixture_sample(docs, group_col="lang", alpha=alpha)
        .select("lang", "keep_rate")
        .distinct()
        .collect()
    }
    by_size = sorted(range(len(sizes)), key=lambda g: sizes[g])
    assert rates[f"g{by_size[0]}"] == 1.0
    for a, b in zip(by_size, by_size[1:]):
        assert rates[f"g{a}"] >= rates[f"g{b}"] - 1e-9


@given(
    s=st.text(
        alphabet=st.characters(min_codepoint=0, max_codepoint=0x7F),
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_normalize_text_idempotent(spark, s):
    """normalize(normalize(x)) == normalize(x) for any ASCII input — the
    cleanup pass must be a projection onto its own fixed points."""
    from bloomy_etl_spark.functions.text import normalize_text

    df = spark.createDataFrame([(s,)], "t string")
    row = df.select(
        normalize_text(F.col("t")).alias("once"),
        normalize_text(normalize_text(F.col("t"))).alias("twice"),
    ).first()
    assert row["once"] == row["twice"]


# ---------------------------------------------------------------------------
# SymSpell completeness (operators/joins.py::fuzzy_value_pairs, q74):
# the deletion-neighborhood equi join must find EXACTLY the pairs the
# quadratic levenshtein join finds — completeness is the mathematical
# claim (lev(a,b) <= k ⇒ the up-to-k deletion neighborhoods intersect),
# soundness comes from the explicit verify step.
# ---------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    vals=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=7),
        min_size=2,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=2),
)
@settings(**SETTINGS)
def test_fuzzy_pairs_match_quadratic_reference(spark, vals, k):
    from bloomy_etl_spark.operators.joins import fuzzy_value_pairs

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_value_pairs(df, "s", k=k).collect()
    }
    uniq = sorted(set(vals))
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= k
    }
    assert got == want


_span_words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])


@given(
    docs=st.lists(
        st.lists(_span_words, min_size=1, max_size=10), min_size=2, max_size=8
    ),
    span=st.sampled_from([2, 3]),
    min_spans=st.sampled_from([1, 2]),
)
@settings(**SETTINGS)
def test_shared_span_pairs_matches_bruteforce(spark, docs, span, min_spans):
    """The r6 fingerprint path (blake2b + NumPy window combine) must
    agree with a Python-set string ground truth, including the whole-doc
    fallback for docs shorter than ``span`` tokens."""
    from bloomy_etl_spark.operators.dedup import shared_span_pairs

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["i"], r["j"]): r["n_shared"]
        for r in shared_span_pairs(
            df, span=span, min_spans=min_spans
        ).collect()
    }
    spans = [
        {" ".join(ws[k:k + span]) for k in range(len(ws) - span + 1)}
        if len(ws) >= span else {" ".join(ws)}
        for ws in docs
    ]
    want = {}
    for i, j in itertools.combinations(range(len(docs)), 2):
        n_shared = len(spans[i] & spans[j])
        if n_shared >= min_spans:
            want[(i, j)] = n_shared
    assert got == want


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1,
                   max_size=8),
    budget=st.integers(min_value=1, max_value=120),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hamilton_apportionment_invariants(spark, sizes, budget):
    """stratified_budget_sample under arbitrary group shapes: the
    sample total is exactly min(budget, corpus); every group is within
    1 of its exact proportional quota (the Hamilton guarantee) whenever
    the budget fits; no group exceeds its population."""
    from bloomy_etl_spark.operators.corpus import stratified_budget_sample

    rows, off = [], 0
    for gi, n in enumerate(sizes):
        rows += [(off + i, f"g{gi}") for i in range(n)]
        off += n
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    total = len(rows)
    out = stratified_budget_sample(docs, budget).collect()
    assert len(out) == min(budget, total)
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    for gi, n in enumerate(sizes):
        got = per.get(f"g{gi}", 0)
        assert got <= n
        if budget <= total:
            exact = budget * n / total
            assert abs(got - exact) <= 1, (sizes, budget, gi, got, exact)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(-100, 100)),
        min_size=1, max_size=120,
    ),
    span=st.integers(1, 500),
)
@settings(max_examples=200, deadline=None)
def test_trail_step_matches_bruteforce(events, span):
    """streaming trailing-range transition ≡ the O(n²) definition:
    frame at t = all points with eus in [t−span, t], in arrival order
    (event-time order per the operator's contract)."""
    from bloomy_etl_spark.streaming.stateful import trail_step

    events = sorted(events)  # the ordering contract
    eus_buf, v_buf = [], []
    for i, (t, v) in enumerate(events):
        n, s = trail_step(eus_buf, v_buf, t, v, span)
        frame = [(tt, vv) for tt, vv in events[: i + 1] if tt >= t - span]
        assert n == len(frame)
        assert s == sum(vv for _, vv in frame)
        # state bound: nothing outside the span is retained
        assert all(tt >= t - span for tt in eus_buf)


@given(
    counts=st.lists(st.integers(1, 10_000), min_size=1, max_size=12),
    budget=st.integers(1, 5_000),
    alpha=st.integers(1, 4),
)
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_temperature_quotas_hamilton_invariants(spark, counts, budget, alpha):
    """Hamilton apportionment invariants at every α: allocations sum to
    the budget exactly, and each group's seat count is within 1 of its
    real-valued share (the no-float-drift guarantee)."""
    from bloomy_etl_spark.operators.corpus import temperature_quotas

    rows = [(f"g{i:02d}", j) for i, n in enumerate(counts) for j in range(n)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = temperature_quotas(df, budget=budget, alpha_quarters=alpha).collect()
    assert sum(r["alloc"] for r in out) == budget
    wsum = sum(r["w_e6"] for r in out)
    for r in out:
        exact = budget * r["w_e6"] / wsum
        assert exact - 1 < r["alloc"] < exact + 1
