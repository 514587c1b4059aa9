"""sf1 (10× documents/embeddings) scale-stress: the "would survive
100×" design claims, measured.

Gated behind ``SPARK_GRAFT_SCALE=1`` (builds a ~10× corpus and runs the
heaviest dedup/ANN queries twice — minutes, not CI material). The
assertions are the scale CONTRACT, not timings:

* shuffle bytes grow ≲ linearly ×(replicas × headroom) from sf0.1 → sf1
  (a super-linear exchange means a pair expansion or join that does not
  scale);
* zero spill at sf1 (partitions must still fit executor memory);
* the job completes with no task failures (implicit: run_profile raises
  otherwise).

``SCALE.md`` at the repo root records the latest measured table; the
refresh recipe is in that file's header.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.scale_sf1 import build_sf1, scale_cases  # noqa: E402

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE") != "1",
    reason="sf1 scale-stress is opt-in: SPARK_GRAFT_SCALE=1",
)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")

# 10× data with 2× headroom for fixed per-run overheads (footers,
# broadcast sides, map-status metadata) that don't scale with rows.
MAX_SHUFFLE_GROWTH = 20.0


@pytest.fixture(scope="module")
def sf1_dir(spark):
    return build_sf1(spark, SF1_DIR)


@pytest.mark.parametrize("name,fn", scale_cases())
def test_shuffle_bytes_scale_linearly(spark, sf1_dir, name, fn):
    from bloomy_etl_spark.tools.profile import run_profile

    small = run_profile(fn(spark, SF01))
    big = run_profile(fn(spark, sf1_dir))
    assert big["spill_bytes"] == 0, f"{name} spilled at sf1"
    s, b = small["shuffle_bytes_written"], big["shuffle_bytes_written"]
    if s == 0:
        assert b == 0, f"{name}: sf1 shuffles ({b}B) where sf0.1 did not"
        return
    growth = b / s
    assert growth <= MAX_SHUFFLE_GROWTH, (
        f"{name}: shuffle bytes grew {growth:.1f}× for 10× data "
        f"({s}B → {b}B) — super-linear exchange"
    )


def test_ivf_index_build_and_search_scale(spark, sf1_dir, tmp_path):
    """IVF build/search on the 10× embedding corpus: build completes,
    search probes a bounded subset of partitions, zero spill."""
    from bloomy_etl_spark.operators.similarity import (
        build_ivf_index,
        search_ivf_index,
    )
    from bloomy_etl_spark.tools.profile import run_profile

    emb = spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet"))
    idx_path = str(tmp_path / "ivf_sf1")
    build_ivf_index(emb, idx_path, max_centroids=16)
    queries = emb.limit(2).select("vec_id", "embedding")
    res = search_ivf_index(spark, idx_path, queries, k=10, nprobe=4)
    prof = run_profile(res)
    assert prof["output_rows"] == 20  # 2 queries × k
    assert prof["spill_bytes"] == 0
    # partition pruning: the corpus scan must touch the probed clusters'
    # files only, never the full corpus file set
    scanned = max(
        (s.get("numFiles", 0) for s in prof["scans"]), default=0
    )
    on_disk = sum(
        1
        for root, _, files in os.walk(os.path.join(idx_path, "corpus"))
        for f in files
        if f.endswith(".parquet")
    )
    assert 0 < scanned < on_disk, (
        f"IVF search read {scanned}/{on_disk} corpus files — pruning lost"
    )


def test_ivfpq_index_scale(spark, sf1_dir, tmp_path):
    """IVF-PQ on the 10× embedding corpus: the compression claim and
    the pruning claim, MEASURED. Codes must be an order of magnitude
    smaller on disk than the raw vectors (logically 64 floats → m=4
    small ints; parquet framing eats some of the 384× headline), and a
    search must read only the probed clusters' files."""
    from bloomy_etl_spark.operators.pq import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from bloomy_etl_spark.tools.profile import run_profile

    emb = spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet"))
    idx_path = str(tmp_path / "ivfpq_sf1")
    build_ivfpq_index(emb, idx_path, m=4, ksub=16,
                      centroid_stride=40, max_centroids=256)

    def disk_bytes(path, ext=".parquet"):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files if f.endswith(ext)
        )

    emb_path = os.path.join(sf1_dir, "embeddings.parquet")
    raw_b = (os.path.getsize(emb_path) if os.path.isfile(emb_path)
             else disk_bytes(emb_path))
    code_b = disk_bytes(os.path.join(idx_path, "corpus"))
    assert code_b < raw_b / 5, (
        f"code lists {code_b}B vs raw {raw_b}B — compression claim lost"
    )

    queries = emb.limit(2).select("vec_id", "embedding")
    res = search_ivfpq_index(spark, idx_path, queries, k=10, nprobe=4)
    prof = run_profile(res)
    assert prof["output_rows"] == 20
    assert prof["spill_bytes"] == 0
    scanned = max((s.get("numFiles", 0) for s in prof["scans"]), default=0)
    on_disk = sum(
        1 for root, _, files in os.walk(os.path.join(idx_path, "corpus"))
        for f in files if f.endswith(".parquet")
    )
    assert 0 < scanned < on_disk, (
        f"IVF-PQ search read {scanned}/{on_disk} corpus files — pruning lost"
    )


def test_covariance_reduce_scale(spark, sf1_dir):
    """The r8 moments/PCA reduce (q105's covariance shares it): shuffle
    volume is a function of partitions × d², NEVER corpus rows, and the
    driver-visible row count is the constant 1 + d + d(d+1)/2 at any
    scale — measured at 10× rows."""
    from bloomy_etl_spark.operators.linalg import _reduced_frame
    from bloomy_etl_spark.sources.tables import load_table
    from bloomy_etl_spark.tools.profile import run_profile

    want_rows = 1 + 64 + 64 * 65 // 2

    def prof(sf_dir):
        embs = load_table(spark, sf_dir, "embeddings")
        parts = embs.rdd.getNumPartitions()
        return run_profile(_reduced_frame(embs, "embedding", 64)), parts

    small, sp = prof(SF01)
    big, bp = prof(sf1_dir)
    assert small["spill_bytes"] == 0 and big["spill_bytes"] == 0
    # driver-visible (= reduce output) rows: corpus-independent constant
    assert small["output_rows"] == want_rows
    assert big["output_rows"] == want_rows
    # shuffle records are one position-exploded partial row set per
    # input partition — flat PER PARTITION across a 10× corpus (3×
    # headroom for partial-agg merge rows)
    per_small = small["shuffle_records_written"] / max(sp, 1)
    per_big = big["shuffle_records_written"] / max(bp, 1)
    assert per_big <= per_small * 3, (
        f"per-partition shuffle grew {per_small:.0f} → {per_big:.0f} "
        "records — the reduce is scaling with rows, not partitions"
    )


def test_ivfpq_refined_scale(spark, sf1_dir, tmp_path):
    """q107's two-stage search at sf1: the exact tier must stay a point
    lookup — shortlist id filter PUSHED into the raw-list scan,
    partition pruning on both tiers (files read < files on disk across
    code + raw lists), zero spill, exact top-k out."""
    import re

    from bloomy_etl_spark.operators.pq import (
        build_ivfpq_index,
        search_ivfpq_refined,
    )
    from bloomy_etl_spark.tools.profile import run_profile

    emb = spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet"))
    idx_path = str(tmp_path / "ivfpq_refined_sf1")
    build_ivfpq_index(emb, idx_path, m=4, ksub=16,
                      centroid_stride=40, max_centroids=256, keep_raw=True)
    queries = emb.limit(2).select("vec_id", "embedding")
    res = search_ivfpq_refined(spark, idx_path, queries, k=10, nprobe=4,
                               shortlist=40)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*In\(neighbor_id", plan), (
        "shortlist id filter not pushed to the raw-list scan at sf1"
    )
    prof = run_profile(res)
    assert prof["output_rows"] == 20
    assert prof["spill_bytes"] == 0
    scanned = sum(s.get("numFiles", 0) for s in prof["scans"])
    on_disk = sum(
        1
        for sub in ("corpus", "raw")
        for root, _, files in os.walk(os.path.join(idx_path, sub))
        for f in files if f.endswith(".parquet")
    )
    assert 0 < scanned < on_disk, (
        f"refined search read {scanned} files vs {on_disk} on disk in "
        "the code+raw tiers alone — pruning lost"
    )


def test_ann_recall_audit_scale(spark, sf1_dir):
    """q126's exchange is O(queries · k · tasks) BY DESIGN — both
    ranked lists flow through per-query WindowGroupLimit caps and the
    metric join is |Q|·k rows a side. The derived fixture grows the
    QUERY set 10× along with the corpus (every 100th vec_id), so the
    blanket 20× linear bound misfires on the queries×tasks product;
    assert the actual contract instead, plus zero spill."""
    import __spark_entry__ as entry
    from bloomy_etl_spark.tools.profile import run_profile

    fn = entry.ALL_QUERIES["q126_ann_recall"]
    for sf, nq in ((SF01, 20), (sf1_dir, 200)):
        prof = run_profile(fn(spark, sf))
        assert prof["spill_bytes"] == 0
        # 2 tiers × |Q| × k=10 × ≤32 tasks, 4× slack for headers/partials
        bound = 2 * nq * 10 * 32 * 4
        assert prof["shuffle_records_written"] <= bound, (
            sf, prof["shuffle_records_written"], bound
        )


def test_binary_hamming_scale_contract(spark, sf1_dir):
    """q110's exchange is O(tasks · queries · k) BY DESIGN: the
    xor+popcount scan never shuffles (queries broadcast), and the only
    exchange is the per-query top-5 WindowGroupLimit partials. The
    derived fixture grows the QUERY set 10× along with the corpus
    (every 100th vec_id — replica offsets are ≡ 0 mod 100), so the
    blanket 20× linear bound misfires on the queries×tasks product;
    assert the actual contract instead, plus zero spill."""
    import __spark_entry__ as entry
    from bloomy_etl_spark.tools.profile import run_profile

    fn = entry.ALL_QUERIES["q110_binary_hamming_topk"]
    for sf, nq in ((SF01, 20), (sf1_dir, 200)):
        prof = run_profile(fn(spark, sf))
        assert prof["spill_bytes"] == 0
        # |Q| × k=5 × ≤32 tasks, 4× slack for headers/partials
        bound = nq * 5 * 32 * 4
        assert prof["shuffle_records_written"] <= bound, (
            sf, prof["shuffle_records_written"], bound
        )
