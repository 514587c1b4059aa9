"""Text-analysis column expressions for large-scale training-data pipelines.

All pure JVM expressions (split/regexp/aggregate lambdas) — no Python UDFs
— so they whole-stage-codegen and scale linearly with the scan. The hash
primitive is md5-derived (first 8 hex chars → int64), chosen because it is
bit-identical across engines (portable to the DuckDB oracle), stable
across Spark versions, and uniform enough for MinHash/SimHash use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization + hashing primitives
# ---------------------------------------------------------------------------

WS = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(text, WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-style token estimate: the larger of word-and-punctuation piece
    count and the ~4-chars/token heuristic — subword models never emit
    fewer tokens than either bound."""
    pieces = F.size(F.regexp_extract_all(text, F.lit(r"(\w+|[^\w\s])"), 0))
    return F.greatest(pieces, F.ceil(F.length(text) / 4).cast("int"))


def md5_int(col: Column) -> Column:
    """Portable 32-bit-ish hash: int64 of the first 8 hex chars of md5.
    Identical in DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def word_ngrams(text: Column, n: int = 3) -> Column:
    """ALL n-word grams in order (with repeats) → array<string>.

    Built by zipping n shifted slices of the token array — gram k is
    ``ws[k] ws[k+1] … ws[k+n-1]`` — so the tokenizing ``split`` runs O(n)
    times per ROW. The obvious alternative (``element_at(ws, i+j)`` inside
    a ``transform`` lambda) embeds the full ``split`` expression in the
    lambda body, where it is re-evaluated per ELEMENT: O(words²) regex
    splits per document, which measured ~10× slower on the shingling
    queries at sf0.1."""
    ws = tokens(text)
    m = F.size(ws) - (n - 1)
    z = F.slice(ws, 1, m)
    for j in range(1, n):
        z = F.zip_with(z, F.slice(ws, j + 1, m), lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(ws) >= n, z).otherwise(F.array(F.concat_ws(" ", ws)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles → array<string>. Sequence-sensitive (unlike
    word sets), the standard unit for near-dup Jaccard/MinHash."""
    return F.array_distinct(word_ngrams(text, n))


# ---------------------------------------------------------------------------
# quality scoring (length / punctuation / stopword / repetition signals)
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    ws = tokens(F.lower(text))
    hits = F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
    return hits / F.size(ws)


def punct_ratio(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"([^\w\s])"), 0)) / F.length(text)


def unique_word_ratio(text: Column) -> Column:
    ws = tokens(F.lower(text))
    return F.size(F.array_distinct(ws)) / F.size(ws)


def mean_word_length(text: Column) -> Column:
    ws = tokens(text)
    return F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w)) / F.size(ws)


def normalize_text(text: Column) -> Column:
    """C4/RefinedWeb-style text normalization: strip ASCII control
    characters, collapse whitespace runs to a single space, trim. The
    cleanup pass that runs BEFORE hashing/shingling so near-dup detection
    is not defeated by formatting noise.

    Whitespace controls (tab, newline, form feed, carriage return) are
    NOT stripped — they collapse to a single space like any run of
    spaces, so line breaks keep words apart. The strip class is the
    remaining controls ``[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]`` —
    deliberately INCLUDING vertical tab (\\x0b): Java regex counts VT as
    ``\\s`` but RE2 does not, so leaving it to the collapse pass would
    diverge between Spark and the DuckDB oracle. Order is part of the
    contract: control-strip, then collapse, then trim."""
    no_ctl = F.regexp_replace(text, "[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]", "")
    return F.trim(F.regexp_replace(no_ctl, "\\s+", " "))


def html_to_text(html: Column) -> Column:
    """HTML → plain text extraction (the CommonCrawl WET-style step that
    precedes every other text operator when the corpus arrives as raw
    markup): drop ``<script>``/``<style>`` subtrees entirely (their
    content is not prose), strip the remaining tags, decode the five
    XML-core entities plus ``&nbsp;`` and numeric ``&#NN;`` space,
    collapse whitespace, trim.

    RE2-portable regexes only (non-greedy spans, no lookaround, no
    backreferences) so the DuckDB oracle runs the identical patterns;
    ``(?is)`` makes tag matching case-insensitive and dot-all so
    multi-line scripts die. Regex HTML parsing is the industry standard
    for corpus extraction at this layer (full DOM parsing is ~100×
    slower and needs a C library); malformed markup degrades to leaving
    fragments, never to an error."""
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    # &amp; decodes LAST: decoding it first would double-decode
    # "&amp;lt;" into "<" instead of the literal "&lt;" the author wrote
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards stopword presence and
    lexical diversity, penalizes extreme length and punctuation soup.
    Deterministic arithmetic only — portable to the SQL oracle."""
    n = token_count(text)
    length_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.3))
    sw = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    diversity = unique_word_ratio(text)
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_ok + sw + diversity + punct_ok) / 4.0


# ---------------------------------------------------------------------------
# repetition / boilerplate signals (Gopher- and C4-style quality rules)
# ---------------------------------------------------------------------------
#
# These operate on an ALREADY-BOUND gram array column (produced by
# word_ngrams and selected into an attribute first). Passing the raw
# word_ngrams(...) expression would embed the tokenizer inside the lambda
# bodies below, where higher-order functions re-evaluate it per ELEMENT —
# the word_shingles pitfall. Callers do:
#
#   df.select(..., word_ngrams(F.col("text"), 2).alias("g2"))
#     .select(..., dup_gram_fraction(F.col("g2")), ...)


def dup_gram_fraction(grams: Column) -> Column:
    """Fraction of grams that are repeats of an earlier gram:
    1 − distinct/total. The C4/Gopher "duplicate n-gram fraction" signal —
    high values mean boilerplate or looping text."""
    return 1.0 - F.size(F.array_distinct(grams)) / F.size(grams)


def top_gram_fraction(grams: Column) -> Column:
    """Occurrence share of the single most frequent gram — Gopher's
    "fraction of text in the most common n-gram" rule.

    Computed in-row (count each DISTINCT gram with a filter pass): O(d·t)
    per row, zero shuffles, fine for web-document lengths. For corpora of
    very long documents the explode → (doc, gram) count → max-per-doc
    shape trades that per-row quadratic for one shuffle keyed by
    (doc, gram); this in-row form keeps the whole quality stack a pure
    projection pipelined with the scan."""
    counts = F.transform(
        F.array_distinct(grams), lambda x: F.size(F.filter(grams, lambda y: y == x))
    )
    return F.array_max(counts) / F.size(grams)


# ---------------------------------------------------------------------------
# PII detection / scrubbing
# ---------------------------------------------------------------------------
#
# Pattern subset chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB oracle): character classes, bounded repetition, \b and \d
# only — no lookarounds or backreferences.

PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[A-Za-z0-9./_%-]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}-\d{3}-\d{3,4}-\d{4}",
}


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII pattern."""
    return F.size(F.regexp_extract_all(text, F.lit(f"({PII_PATTERNS[kind]})"), 0))


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with a typed mask token (<URL>, <EMAIL>,
    <IPV4>, <PHONE>). URL first: an email-like substring inside a URL path
    must not be double-masked."""
    out = text
    for kind in ("url", "email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# ---------------------------------------------------------------------------
# language identification (marker-token heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "que", "y", "los"),
    "fr": ("le", "la", "et", "les", "des"),
}
CJK_PATTERN = r"[一-鿿]"


def lang_scores(text: Column) -> dict[str, Column]:
    ws = tokens(F.lower(text))
    scores = {
        lang: F.size(F.filter(ws, lambda w: w.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    scores["zh"] = F.size(F.regexp_extract_all(text, F.lit(f"({CJK_PATTERN})"), 0))
    return scores


def predict_lang(text: Column) -> Column:
    """Argmax of marker scores, deterministic tie-break by language code
    order; 'und' (undetermined) when no marker fires."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed so earlier codes win ties via later when() precedence
    for lang in sorted(scores, reverse=True):
        pred = F.when((best > 0) & (scores[lang] == best), lang).otherwise(pred)
    return pred


def collapse_token_repeats(ws: Column) -> Column:
    """Collapse every run of consecutively repeated tokens to a single
    occurrence (``a a a b a`` → ``a b a``) — the cheap intra-document
    cleaning stage for stutter/boilerplate artifacts (tag soup, OCR
    echo, template spam) that repetition METRICS (q39) only measure.

    ``ws`` must be a materialized array COLUMN (not an inline
    ``tokens(...)`` expression): the lambda references the array to
    read each element's predecessor, and an inline expression would be
    re-evaluated per element (the word_ngrams O(words²) pitfall).

    Engine-exact: keep token i iff ``i == 0`` or it differs from its
    predecessor. The predecessor lookup uses ``greatest(i, 1)`` so
    index 0 never touches ``element_at(ws, 0)`` (which throws; SQL OR
    does not short-circuit past runtime errors) — at i = 0 the lookup
    degenerates to comparing the first token with itself and the
    ``i == 0`` branch keeps it. DuckDB replays as
    ``list_filter(ws, (x, i) -> i = 1 OR x <> ws[i-1])`` (there,
    ``ws[0]`` is NULL and ``x <> NULL`` is NULL, absorbed by OR).

    Order-preserving, no UDF, no shuffle — pure per-row array work.
    """
    return F.filter(
        ws,
        lambda x, i: (i == F.lit(0))
        | (x != F.element_at(ws, F.greatest(i, F.lit(1)))),
    )
