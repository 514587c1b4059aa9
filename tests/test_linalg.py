"""Distributed linear algebra (operators/linalg.py) vs NumPy on the
collected fixture — moments, PCA, projection, whitening."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.linalg import (
    moments,
    pca_fit,
    pca_project,
    whiten,
)
from bloomy_etl_spark.sources.tables import load_table

from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_ORACLE, "embeddings", fan_out=True)


@pytest.fixture(scope="module")
def x(embs):
    rows = embs.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


class TestMoments:
    def test_matches_numpy(self, embs, x):
        n, mean, cov = moments(embs)
        assert n == x.shape[0]
        np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(
            cov, np.cov(x, rowvar=False, bias=True), rtol=1e-8, atol=1e-10
        )

    def test_partition_invariant(self, spark, embs, x):
        _, m1, c1 = moments(embs.repartition(13))
        _, m2, c2 = moments(embs.coalesce(1))
        np.testing.assert_allclose(m1, m2, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(c1, c2, rtol=1e-9, atol=1e-11)

    def test_empty_raises(self, spark, embs):
        with pytest.raises(ValueError):
            moments(embs.filter(F.lit(False)), dim=64)

    def test_driver_rows_partition_independent(self, embs):
        """The collect feeding moments() must see exactly
        1 + d + d(d+1)/2 reduced rows NO MATTER the partition count —
        the r8 fix for the O(partitions·d²) driver collect (a 10⁵-
        partition corpus at d=768 would otherwise ship hundreds of GB
        to the driver)."""
        from bloomy_etl_spark.operators.linalg import _reduced_frame

        want = 1 + 64 + 64 * 65 // 2
        few = _reduced_frame(embs.repartition(4), "embedding", 64)
        many = _reduced_frame(embs.repartition(57), "embedding", 64)
        assert few.count() == want
        assert many.count() == want
        # and the reduced values themselves are partition-invariant to
        # float tolerance (summation grouping differs)
        a = {r["pos"]: r["v"] for r in few.collect()}
        b = {r["pos"]: r["v"] for r in many.collect()}
        assert a.keys() == b.keys()
        for p, v in a.items():
            np.testing.assert_allclose(v, b[p], rtol=1e-9, atol=1e-9)


class TestPca:
    def test_matches_numpy_eigh(self, embs, x):
        mean, comps, vals = pca_fit(embs, k=5)
        cov = np.cov(x, rowvar=False, bias=True)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:5]
        np.testing.assert_allclose(vals, w[order], rtol=1e-8)
        for i, col in enumerate(order):
            ref = v[:, col]
            j = int(np.argmax(np.abs(comps[i])))
            if ref[j] < 0:
                ref = -ref
            np.testing.assert_allclose(comps[i], ref, rtol=1e-6, atol=1e-8)

    def test_projection_variance_equals_eigenvalues(self, embs):
        mean, comps, vals = pca_fit(embs, k=3)
        proj = pca_project(embs, mean, comps)
        p = np.asarray(
            [np.asarray(r["pca"]) for r in proj.select("pca").collect()]
        )
        np.testing.assert_allclose(p.var(axis=0), vals, rtol=1e-8)
        # projection preserves every original column
        assert set(proj.columns) == {"vec_id", "embedding", "label", "pca"}

    def test_whiten_unit_variance(self, embs):
        out = whiten(embs, k=4)
        w = np.asarray(
            [np.asarray(r["white"]) for r in out.select("white").collect()]
        )
        np.testing.assert_allclose(w.var(axis=0), np.ones(4), rtol=1e-6)
        np.testing.assert_allclose(w.mean(axis=0), np.zeros(4), atol=1e-10)

    def test_bad_k(self, embs):
        with pytest.raises(ValueError):
            pca_fit(embs, 0)
        with pytest.raises(ValueError):
            pca_fit(embs, 65)


class TestCovarianceLong:
    def test_matches_driver_collect_moments(self, embs, x):
        """The distributed hash-agg reduce must equal moments()'s
        driver-collect reduce on the raw floats (to float tolerance —
        summation grouping differs by design)."""
        from bloomy_etl_spark.operators.linalg import covariance_long, moments

        _, _, cov = moments(embs)
        got = {(r["i"], r["j"]): r["cov"]
               for r in covariance_long(embs).collect()}
        assert len(got) == 64 * 65 // 2
        for (i, j), v in got.items():
            assert i <= j
            np.testing.assert_allclose(v, cov[i, j], rtol=1e-9, atol=1e-9)


class TestPowerIteration:
    def test_matches_numpy_reference_iteration(self, spark, embs, x):
        """The distributed quantized power iteration must equal a NumPy
        replay of the SAME algorithm exactly (integer mat-vecs,
        index-order norm folds, FLOOR re-quantization), and its Rayleigh
        estimate must sit inside the covariance spectrum, above the mean
        eigenvalue, and grow monotonically with more steps. (The fixture
        spectrum is near-degenerate — λ1/λ2 ≈ 1.01 — so few-step
        convergence to eigh's top VECTOR is not a meaningful claim; the
        algorithm-equality + spectrum invariants are.)"""
        from pyspark.sql import functions as F

        from bloomy_etl_spark.operators.linalg import (
            covariance_long,
            power_iteration_long,
        )

        xq = np.floor(x * 1000)
        cq = np.floor(np.cov(xq, rowvar=False, bias=True))
        w = np.linalg.eigvalsh(cq)

        def ref(iters, scale=1000):
            v = np.full(64, float(scale))
            for _ in range(iters):
                wv = cq @ v  # exact: integer-valued operands
                acc = 0.0
                for t in wv:  # index-order fold, as the operator runs
                    acc += t * t
                vn = np.floor(wv / (acc ** 0.5) * scale)
                lam_num = 0.0
                for a, b in zip(wv, v):
                    lam_num += a * b
                lam_den = 0.0
                for a in v:
                    lam_den += a * a
                v, lam = vn, lam_num / lam_den
            return v, round(lam, 6)

        q = embs.select(
            F.transform(
                F.col("embedding"),
                lambda v: F.floor(v.cast("double") * 1000).cast("double"),
            ).alias("embedding")
        )
        lams = []
        for iters in (1, 3):
            out = power_iteration_long(
                covariance_long(q, "embedding", dim=64), dim=64, iters=iters
            ).collect()
            got_v = np.zeros(64)
            for r in out:
                got_v[r["pos"]] = r["v"]
            got_lam = out[0]["lam"]
            want_v, want_lam = ref(iters)
            np.testing.assert_array_equal(got_v, want_v)
            assert got_lam == want_lam, (got_lam, want_lam)
            assert w.min() - 1 <= got_lam <= w.max() + 1
            lams.append(got_lam)
        # ascending toward the top: strictly more after more steps, and
        # past the spectrum mean by step 3 (step 1's estimate is just
        # the all-ones direction's Rayleigh quotient — anywhere in the
        # spectrum)
        assert lams[1] > lams[0]
        assert lams[1] > w.mean()

    def test_bad_iters_raises(self, spark, embs):
        from bloomy_etl_spark.operators.linalg import (
            covariance_long,
            power_iteration_long,
        )

        with pytest.raises(ValueError):
            power_iteration_long(
                covariance_long(embs, "embedding", dim=64), dim=64, iters=0
            )

    def test_zero_matrix_collapse_raises_in_plan(self, spark):
        """iters=1 skips the driver loop's collapse guard, so the final
        IN-PLAN step must raise the same error at execution instead of
        silently emitting NULL rows (constant embeddings floor-quantize
        to an all-zero covariance)."""
        from bloomy_etl_spark.operators.linalg import (
            covariance_long,
            power_iteration_long,
        )

        const = spark.range(8).select(
            F.array(*[F.lit(0.5)] * 4).alias("embedding")
        )
        out = power_iteration_long(
            covariance_long(const, "embedding", dim=4), dim=4, iters=1
        )
        with pytest.raises(Exception, match="collapsed to the zero vector"):
            out.collect()
