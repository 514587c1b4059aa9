"""Product quantization (PQ) for embedding corpora: train, encode,
asymmetric-distance search.

The memory wall at 100 TB is the EMBEDDINGS, not the text: a 768-dim
float32 vector is 3 KB; the same vector PQ-encoded with m=8 subspaces ×
256 centroids is 8 BYTES (384× smaller), and ADC search scans codes with
table lookups instead of float dot products. This module is the
compression half of the classic IVF-PQ design (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011); the coarse
half (inverted lists, partition-pruned probes) already exists in
``similarity.build_ivf_index``/``search_ivf_index`` — compose them by
PQ-encoding each inverted list's residuals or raw vectors.

Spark shapes:

* **train** — m independent k-means over subvector SLICES; each reuses
  ``clustering.kmeans_lloyd`` (corpus-parallel assign, one (cluster,pos)
  shuffle per round, k·dsub driver floats). Codebooks are tiny
  (m·ksub·dsub doubles) and live as expression literals thereafter.
* **encode** — pure column expression: per subspace an ``array_min``
  over ksub (dist², idx) structs; no UDF, no shuffle, pipelined with the
  scan. Ties break to the lower code index (deterministic).
* **search (ADC)** — the query builds m lookup tables of ksub distances
  DRIVER-side (m·ksub floats); the corpus scan then scores each code
  row as Σ_m LUT[m][code_m] via ``element_at`` on literal arrays — one
  corpus map + a top-k sort, zero Python in the hot path.

Determinism: kmeans_lloyd's no-RNG init + quantized means, and
lower-index tie-breaks everywhere, so the whole train/encode/search
pipeline replays identically across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.clustering import kmeans_lloyd

__all__ = ["train_pq", "pq_encode", "pq_search", "reconstruction_mse"]


def _check_dims(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m} subspaces")
    return dim // m


def train_pq(embs: DataFrame, m: int = 4, ksub: int = 16, iters: int = 2,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[float]]]:
    """Train ``m`` subspace codebooks of ``ksub`` centroids each.

    Returns ``codebooks[s][c]`` = centroid ``c`` of subspace ``s`` (a
    dsub-float list). Each subspace trains with the deterministic
    Lloyd's in ``clustering.kmeans_lloyd`` on a sliced view of the
    corpus — m sequential corpus-parallel jobs, driver state bounded by
    m·ksub·dsub floats.
    """
    first = embs.select(vec_col).first()
    if first is None:
        raise ValueError("cannot train PQ on an empty corpus")
    dsub = _check_dims(len(first[vec_col]), m)
    codebooks = []
    for s in range(m):
        sub = embs.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("embedding"),
        )
        cents, _ = kmeans_lloyd(sub, k=ksub, iters=iters)
        codebooks.append(cents)
    return codebooks


def _sub_dist2(vec_col, s: int, dsub: int, centroid: list[float]):
    """Squared L2 from subvector ``s`` of ``vec_col`` to a literal
    centroid, summed in index order (engine-stable)."""
    sub = F.slice(vec_col, s * dsub + 1, dsub)
    carr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(sub, carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def pq_encode(embs: DataFrame, codebooks: list[list[list[float]]],
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode every vector as ``codes: array<int>`` (one code per
    subspace, nearest centroid, ties to the lower index). Expression-
    only — pipelines with the scan at any corpus size."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for s in range(m):
        scored = F.array(
            *[
                F.struct(
                    _sub_dist2(F.col(vec_col), s, dsub, c).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(codebooks[s])
            ]
        )
        codes.append(F.array_min(scored)["c"])
    return embs.select(F.col(id_col).alias(id_col), F.array(*codes).alias("codes"))


def pq_search(codes: DataFrame, codebooks: list[list[list[float]]],
              query: list[float], k: int = 5,
              id_col: str = "vec_id") -> DataFrame:
    """ADC top-k: score = Σ over subspaces of LUT[s][code_s], where
    LUT[s][c] = ‖query_s − codebook[s][c]‖² is computed driver-side
    (m·ksub floats). Returns (id, adc_dist2, rank) rows, rank 1..k,
    ties broken on id. One corpus map + a k-row sort; the only data
    moved is the top-k."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query) != m * dsub:
        raise ValueError(
            f"query dim {len(query)} != codebook dim {m * dsub}"
        )
    luts = []
    for s in range(m):
        qs = query[s * dsub:(s + 1) * dsub]
        luts.append([
            sum((a - b) * (a - b) for a, b in zip(qs, c))
            for c in codebooks[s]
        ])
    score = None
    for s in range(m):
        lut = F.array(*[F.lit(float(x)) for x in luts[s]])
        term = F.element_at(lut, F.element_at(F.col("codes"), s + 1) + 1)
        score = term if score is None else score + term
    scored = codes.select(F.col(id_col), score.alias("adc_dist2"))
    # orderBy+limit plans as TakeOrderedAndProject — a distributed
    # per-partition top-k merge, NOT a global sort; the unpartitioned
    # row_number window then ranks only the k survivors (bounded)
    topk = scored.orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc()).limit(k)
    w = F.row_number().over(
        Window.orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
    )
    return topk.select(
        id_col, F.round("adc_dist2", 6).alias("adc_dist2"),
    ).withColumn("rank", w)


def reconstruction_mse(embs: DataFrame, codebooks: list[list[list[float]]],
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> float:
    """Mean squared reconstruction error over the corpus — the PQ
    quality metric (lower = codebooks fit the distribution better).
    One encode + one aggregate; returns a single driver float."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    enc = pq_encode(embs, codebooks, id_col, vec_col)
    joined = embs.select(F.col(id_col), F.col(vec_col)).join(enc, id_col)
    err = None
    for s in range(m):
        cb = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in codebooks[s]
        ])
        rec = F.element_at(cb, F.element_at(F.col("codes"), s + 1) + 1)
        sub = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        e = F.aggregate(
            F.zip_with(sub, rec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        )
        err = e if err is None else err + e
    row = joined.select(F.avg(err).alias("mse")).first()
    return float(row["mse"])
