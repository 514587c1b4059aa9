"""sf1 fixture derivation + scale-stress harness (shared by
tests/test_scale_sf1.py and the SCALE.md refresh script).

The driver ships sf0.001/0.01/0.1 only; the 100 TB brief wants the
"would survive 100×" claims MEASURED, so we derive a 10×-documents /
10×-embeddings corpus from sf0.1 deterministically:

* documents: 10 replicas. Replica 0 is sf0.1 verbatim; replica r>0
  prefixes every token with ``r{r}t`` — intra-replica duplicate/near-dup
  structure is preserved EXACTLY (pair counts scale ×10 linearly) while
  cross-replica shingle/minhash matches are impossible (disjoint token
  vocabularies). doc_ids offset by r·10⁸.
* embeddings: 10 replicas; replica r>0 applies a deterministic small
  rotation-free perturbation (adds r/1000 to one coordinate) and offsets
  vec_id by r·10⁸ — cluster geometry is preserved, no exact vector dups
  across replicas.
* all other tables are symlinked from sf0.1 (the scale queries under
  test read documents/embeddings only).

Everything is seedless and deterministic: same input → same bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"
REPLICAS = 10
ID_STRIDE = 10**8
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def build_sf1(spark: SparkSession, out_dir: str) -> str:
    """Materialize the derived sf1 directory (idempotent: reuses a
    complete existing build)."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    reps = []
    for r in range(REPLICAS):
        rep = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * ID_STRIDE)
        )
        if r > 0:
            pfx = f"r{r}t"
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.concat(F.lit(pfx), w),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text"))
        reps.append(rep)
    big_docs = reps[0]
    for rep in reps[1:]:
        big_docs = big_docs.unionByName(rep)
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    ereps = []
    for r in range(REPLICAS):
        rep = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * ID_STRIDE))
        if r > 0:
            eps = r / 1000.0
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda v, i: F.when(i == 0, v + F.lit(eps)).otherwise(v),
                ),
            )
        ereps.append(rep)
    big_emb = ereps[0]
    for rep in ereps[1:]:
        big_emb = big_emb.unionByName(rep)
    big_emb.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir


def scale_cases():
    """(name, builder) pairs for the scale-stressed operator surface —
    the heaviest dedup/ANN queries from the declared corpus."""
    import __spark_entry__ as entry

    names = [
        "q30_minhash_lsh_neardups",
        "q31_ngram_jaccard_neardups",
        "q61_shared_spans",
        "q67_dedup_kept_corpus",
        "q41_ivf_ann_topk",
        "q104_ivfpq_topk",
        # r8 quantization tiers: brute-force over compressed codes —
        # shuffle must stay O(corpus) (broadcast queries, no pair blowup).
        # q110 is NOT here: its only exchange is the per-query
        # WindowGroupLimit partials, O(tasks·queries·k) and
        # corpus-independent — the derived fixture grows the query set
        # 10× with the corpus, so the blanket ratio misfires on it; it
        # has a dedicated contract test like q126.
        "q109_sq8_topk",
        "q111_jl_projection_topk",
        # r8 co-occurrence mining: in-row pairs, vocab²-bounded exchange
        "q112_cooccurrence_lift",
        # r8 exact similarity join: prefix-filtered postings + bounded
        # candidate verify — the lossless dedup path must also scale
        "q113_prefix_jaccard_join",
        # r8 winnowing: window-min sub-sampled span index — shuffle must
        # stay linear AND stay below q61's full span index (density row
        # in SCALE.md)
        "q118_winnow_fingerprints",
        # r8 portable HLL: register exchange is m·groups-bounded — must
        # not grow with corpus rows at all
        "q119_hll_registers",
        # r8 DSIR: the only exchange is the B-row bucket-total reduce
        # (B × tasks partials) — bounded-state like the sketches; the
        # scored corpus itself must never shuffle
        "q121_dsir_selection",
        # r8 composed curation pipeline: three window shuffles whose
        # keys (sha, fingerprint, domain) all grow linearly in docs
        "q123_curation_pipeline",
        # r8 Hamilton sampling: G-row apportionment windows + one
        # per-group rank window — linear in docs, constant in G
        "q124_stratified_sample",
        # r8 token-balanced sharding: two-phase prefix sum — bucket
        # totals + parallel per-bucket scans, linear in docs
        "q129_token_shards",
        # r8 cross-source KMV audit: the distinct pass is the only
        # corpus-bounded exchange (map-side dedup); sketches are ≤ k
        # per source and the pair stage is in-row over a broadcast
        "q125_source_overlap",
        # r9 first-occurrence novelty: two gram-keyed hash-aggs over
        # ONE exploded gram stream, doc-grain join only — the exchange
        # must stay linear in the gram stream (no gram-grain join back)
        "q133_novelty_profile",
        # r9 repetition gates: one tagged (doc, n, gram) exchange —
        # linear in the gram stream, map-side combinable
        "q137_gopher_repetition",
        # r9 char entropy: (doc, char) partials — docs × alphabet, far
        # below the char stream; must stay linear in docs
        "q138_char_entropy",
        # r9 Pareto skyline: the x-keyed agg is the only corpus-bounded
        # exchange; the window frame is the distinct-x DOMAIN
        "q143_pareto_frontier",
    ]
    cases = [(n, entry.ALL_QUERIES[n]) for n in names if n in entry.ALL_QUERIES]
    # SemDeDup's scale contract holds under its PRESCRIBED sizing
    # (k ≈ corpus/1000, the auto-k default): pair volume per cluster is
    # quadratic in cluster size, so a FIXED k (q103's oracle-replay
    # k=8) grows shuffle ~(10×)² on 10× data by construction — that is
    # the knob, not a defect. Stress the auto-k path here.
    cases.append(("semdedup_auto_k", _semdedup_auto_k))
    return cases


def _semdedup_auto_k(spark, sf_dir):
    from bloomy_etl_spark.operators.semdedup import semantic_dedup
    from bloomy_etl_spark.sources.tables import load_table

    embs = load_table(spark, sf_dir, "embeddings", fan_out=True)
    return semantic_dedup(embs, threshold=0.35)  # k auto-sized n/1000
