"""Count-min sketch: sub-linear frequency estimation for streams and
shuffles too wide to count exactly.

At 100 TB, ``groupBy(token).count()`` over raw n-grams shuffles a row
per distinct key — fine for the top-k heap (``corpus.top_ngrams``), but
a *frequency oracle* (answer "how often does X occur" for arbitrary X,
later, without the corpus) needs bounded state. The CM sketch (Cormode
& Muthukrishnan 2005) is the standard answer: a d×w counter matrix,
item increments one counter per row at ``h_i(x) mod w``; the estimate
``min_i counter[i][h_i(x)]`` never under-counts and over-counts by at
most ``ε·N`` with probability ``1−δ`` for ``w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉``.

Spark shape: building the sketch is ONE aggregation keyed by (row,
bucket) — at most d·w result rows regardless of corpus size, with
map-side partial counts doing almost all the work (the whole point:
shuffle volume is bounded by the sketch size, not the key cardinality).
Estimation joins candidate keys against the tiny sketch (broadcast).
Counters are integers and the hash is the engine-portable md5 int, so a
DuckDB oracle replays both build and probe bit-exactly (q65).

Sketches built on disjoint corpus slices merge by cell-wise addition —
the property that makes CMS work for incremental ingest (add today's
sketch to the store) and distributed build (partial aggregation IS the
merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloomy_etl_spark.functions.text import md5_int


def _bucket(item, row: int, width: int):
    """Row ``row``'s bucket for an item: portable md5 of the salted key.
    Distinct salts per row give the d independent-enough hash functions
    the CMS analysis needs."""
    return F.pmod(
        md5_int(F.concat(F.lit(f"cms{row}:"), item.cast("string"))),
        F.lit(width),
    )


def cms_build(items: DataFrame, item_col: str, depth: int = 4,
              width: int = 256) -> DataFrame:
    """Build the sketch: one row per NON-ZERO cell (row, bucket, cnt).
    d·w bounded output; one shuffle whose volume is the sketch size."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    item = F.col(item_col)
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(item, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c")
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two same-shape sketches (disjoint-slice merge)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, item_col: str,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point estimates for ``keys``: join each key's d cells against the
    sketch (broadcast — the sketch is at most d·w rows) and take the
    row-wise minimum. Missing cells count 0 (the key never hashed
    there). Adds an ``est`` column; guarantees ``est >= true count``.
    """
    item = F.col(item_col)
    probes = keys.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(item, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count store (Spark's native DataSketches HLL).
#
# The CMS answers "how OFTEN does X occur"; the HLL store answers "how
# many DISTINCT values does group g have" — per-domain distinct URLs,
# per-language distinct documents — with bounded state per group
# (~2^lgk bytes) instead of a distinct-shuffle of the raw keys.
# ``approx_count_distinct`` alone gives the number but not a MERGEABLE
# artifact; ``hll_sketch_agg`` gives a binary sketch that unions across
# batches/slices losslessly w.r.t. the registers (unions promote the
# internal representation, so estimates track the one-shot build to
# ~1%, unit-measured), so daily sketches roll up to monthly without
# touching the raw data. Same durable-table posture as the CMS store;
# no DuckDB-replayable oracle (sketch bytes are library-internal) →
# unit-verified: slice merge within 2% of one-shot, both within HLL
# error of the exact distinct count.
# ---------------------------------------------------------------------------
def hll_build(df: DataFrame, keys: list[str], item_col: str,
              lgk: int = 12) -> DataFrame:
    """Per-group HLL sketch over ``item_col`` (binary column ``hll``).
    One aggregation; shuffle volume = one ~2^lgk-byte sketch per group.
    ``lgk`` 12 → ~1.6% relative standard error."""
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    return grouped.agg(
        F.hll_sketch_agg(F.col(item_col), F.lit(lgk)).alias("hll")
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union any number of per-group sketch tables (monoid reduce, like
    ``incremental.merge_states``): same group in several inputs unions
    cell-wise; the result is again a sketch table."""
    if not sketches:
        raise ValueError("no sketches given")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [c for c in u.columns if c != "hll"]
    grouped = u.groupBy(*keys) if keys else u.groupBy()
    return grouped.agg(F.hll_union_agg(F.col("hll")).alias("hll"))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """Sketch table → (keys…, n_distinct long). Pure projection."""
    keys = [c for c in sketch.columns if c != "hll"]
    return sketch.select(
        *keys, F.hll_sketch_estimate(F.col("hll")).alias("n_distinct")
    )
