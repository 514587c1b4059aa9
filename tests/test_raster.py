"""Warp operator semantics (operators/raster.py): identity round-trips,
hand-computed bilinear values, nodata exclusion, nearest/fmask path,
out-of-bounds handling, and (where rasterio is importable) parity of the
NumPy engine with rasterio's warp on a same-CRS grid."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomy_etl_spark.operators.raster import (
    TILE_SCHEMA,
    _invert_affine,
    _numpy_warp,
    _rasterio_available,
    tiles_to_pixels,
    warp_to_grid,
)

# north-up grid: 1-unit pixels, origin (10, 20), y decreasing
SRC_T = [1.0, 0.0, 10.0, 0.0, -1.0, 20.0]


def _tile_df(spark, data: np.ndarray, transform=SRC_T, crs="EPSG:4326",
             tile_id="T0", band="red"):
    h, w = data.shape
    rows = [(tile_id, band, h, w, [float(v) for v in transform],
             crs, [float(v) for v in data.ravel()])]
    return spark.createDataFrame(rows, TILE_SCHEMA)


class TestAffineMath:
    def test_inverse_roundtrip(self):
        t = np.array([0.5, 0.1, -3.0, -0.2, -0.5, 7.0])
        inv = _invert_affine(t)
        # map pixel (col,row)=(4,9) forward then back
        x = t[0] * 4 + t[1] * 9 + t[2]
        y = t[3] * 4 + t[4] * 9 + t[5]
        col = inv[0] * x + inv[1] * y + inv[2]
        row = inv[3] * x + inv[4] * y + inv[5]
        assert col == pytest.approx(4.0) and row == pytest.approx(9.0)

    def test_singular_raises(self):
        with pytest.raises(ValueError):
            _invert_affine(np.array([1.0, 2.0, 0.0, 2.0, 4.0, 0.0]))


class TestNumpyWarp:
    def test_identity_is_exact(self):
        src = np.arange(12, dtype=np.float64).reshape(3, 4)
        for rs in ("bilinear", "nearest"):
            out = _numpy_warp(src, SRC_T, SRC_T, (3, 4), rs, None, np.nan)
            np.testing.assert_array_equal(out, src)

    def test_half_pixel_shift_bilinear(self):
        """Destination shifted half a pixel right: each output pixel is
        the mean of two horizontal neighbors (textbook bilinear)."""
        src = np.array([[0.0, 10.0, 20.0, 30.0]])
        dst_t = [1.0, 0.0, 10.5, 0.0, -1.0, 20.0]
        out = _numpy_warp(src, SRC_T, dst_t, (1, 4), "bilinear", None, np.nan)
        assert out[0, 0] == pytest.approx(5.0)
        assert out[0, 1] == pytest.approx(15.0)
        assert out[0, 2] == pytest.approx(25.0)
        # rightmost center falls past the last source center: only the
        # edge pixel contributes (renormalized weight) -> its own value
        assert out[0, 3] == pytest.approx(30.0)

    def test_upsample_2x_bilinear_centers(self):
        """2x upsample: dst centers interleave src centers at ±0.25 px —
        interior values are the 75/25 blends, corners replicate."""
        src = np.array([[0.0, 100.0]])
        dst_t = [0.5, 0.0, 10.0, 0.0, -1.0, 20.0]
        out = _numpy_warp(src, SRC_T, dst_t, (1, 4), "bilinear", None, np.nan)
        assert out[0, 0] == pytest.approx(0.0)     # past-left: edge clamp
        assert out[0, 1] == pytest.approx(25.0)
        assert out[0, 2] == pytest.approx(75.0)
        assert out[0, 3] == pytest.approx(100.0)

    def test_nearest_downsample_stride(self):
        src = np.arange(16, dtype=np.float64).reshape(4, 4)
        # 2x downsample: 2-unit pixels; dst center (1,1)px -> src (2,2)
        dst_t = [2.0, 0.0, 10.0, 0.0, -2.0, 20.0]
        out = _numpy_warp(src, SRC_T, dst_t, (2, 2), "nearest", None, np.nan)
        np.testing.assert_array_equal(out, [[5.0, 7.0], [13.0, 15.0]])

    def test_nodata_excluded_and_renormalized(self):
        """A -9999 source neighbor must not bleed into the blend: its
        weight is dropped and the remainder renormalized; an all-nodata
        neighborhood yields dst_nodata."""
        src = np.array([[10.0, -9999.0], [-9999.0, -9999.0]])
        dst_t = [1.0, 0.0, 10.5, 0.0, -1.0, 19.5]  # center between all 4
        out = _numpy_warp(src, SRC_T, dst_t, (1, 1), "bilinear",
                          -9999.0, np.nan)
        assert out[0, 0] == pytest.approx(10.0)
        src_all = np.full((2, 2), -9999.0)
        out2 = _numpy_warp(src_all, SRC_T, dst_t, (1, 1), "bilinear",
                           -9999.0, np.nan)
        assert math.isnan(out2[0, 0])
        # nearest maps nodata to dst_nodata, never passes -9999 through
        out3 = _numpy_warp(src, SRC_T, SRC_T, (2, 2), "nearest",
                           -9999.0, np.nan)
        assert out3[0, 0] == 10.0 and math.isnan(out3[0, 1])

    def test_out_of_bounds_is_nodata(self):
        src = np.ones((2, 2))
        dst_t = [1.0, 0.0, 100.0, 0.0, -1.0, 200.0]  # disjoint grid
        out = _numpy_warp(src, SRC_T, dst_t, (2, 2), "bilinear", None, np.nan)
        assert np.isnan(out).all()


class TestWarpOperator:
    def test_identity_roundtrip_and_n_valid(self, spark):
        data = np.arange(12, dtype=np.float64).reshape(3, 4)
        data[0, 0] = -9999.0
        tiles = _tile_df(spark, data)
        out = warp_to_grid(
            tiles, SRC_T, dst_width=4, dst_height=3, engine="numpy",
            resampling="nearest",
        ).first()
        assert out["n_valid"] == 11
        # NaN nodata surfaces as NULL through the Arrow list boundary —
        # the same NaN->NULL convention as P4
        got = np.array(
            [math.nan if v is None else v for v in out["data"]]
        ).reshape(3, 4)
        assert math.isnan(got[0, 0])
        np.testing.assert_array_equal(got.ravel()[1:], data.ravel()[1:])
        assert out["transform"] == SRC_T and out["crs"] == "EPSG:4326"

    def test_crs_mismatch_raises_without_rasterio(self, spark):
        if _rasterio_available():
            pytest.skip("rasterio importable: auto engine would reproject")
        tiles = _tile_df(spark, np.ones((2, 2)), crs="EPSG:32633")
        with pytest.raises(Exception, match="rasterio"):
            warp_to_grid(tiles, SRC_T, 2, 2, engine="numpy").collect()

    def test_bad_args(self, spark):
        tiles = _tile_df(spark, np.ones((2, 2)))
        with pytest.raises(ValueError):
            warp_to_grid(tiles, SRC_T, 2, 2, resampling="cubic")
        with pytest.raises(ValueError):
            warp_to_grid(tiles, SRC_T, 2, 2, engine="gdal")

    def test_tiles_to_pixels_explode(self, spark):
        data = np.array([[1.0, np.nan], [3.0, 4.0]])
        tiles = _tile_df(spark, data)
        warped = warp_to_grid(tiles, SRC_T, 2, 2, engine="numpy",
                              resampling="nearest", src_nodata=None)
        px = {(r["y"], r["x"]): r["value"]
              for r in tiles_to_pixels(warped).collect()}
        assert px[(0, 0)] == 1.0 and px[(1, 1)] == 4.0
        assert px[(0, 1)] is None  # NaN -> NULL (P4 convention)
        assert len(px) == 4

    def test_multi_tile_shared_grid(self, spark):
        """Two tiles with DIFFERENT source grids land on one shared
        destination grid — the reference's alignment-by-construction
        design (all dates share dst_transform)."""
        a = _tile_df(spark, np.full((2, 2), 5.0), tile_id="A")
        shifted = [1.0, 0.0, 11.0, 0.0, -1.0, 20.0]  # one pixel east
        b = _tile_df(spark, np.full((2, 2), 9.0), transform=shifted,
                     tile_id="B")
        out = warp_to_grid(a.union(b), SRC_T, 3, 2, engine="numpy",
                           resampling="nearest", src_nodata=None)
        got = {
            r["tile_id"]: np.array(
                [math.nan if v is None else v for v in r["data"]]
            ).reshape(2, 3)
            for r in out.collect()
        }
        np.testing.assert_array_equal(got["A"][:, :2], 5.0)
        assert np.isnan(got["A"][:, 2]).all()
        assert np.isnan(got["B"][:, 0]).all()
        np.testing.assert_array_equal(got["B"][:, 1:], 9.0)


@pytest.mark.skipif(not _rasterio_available(),
                    reason="rasterio not importable here")
def test_numpy_engine_matches_rasterio_same_crs(spark):
    """Where rasterio exists, the NumPy engine must agree with it on a
    same-CRS bilinear warp away from nodata/edges (GDAL edge handling
    differs in the outermost half-pixel ring by design)."""
    rng = np.random.default_rng(7)
    data = rng.uniform(0, 100, size=(16, 16))
    tiles = _tile_df(spark, data)
    dst_t = [0.8, 0.0, 10.7, 0.0, -0.8, 19.3]
    a = warp_to_grid(tiles, dst_t, 12, 12, engine="numpy").first()
    b = warp_to_grid(tiles, dst_t, 12, 12, engine="rasterio").first()
    ga = np.array(a["data"]).reshape(12, 12)[1:-1, 1:-1]
    gb = np.array(b["data"]).reshape(12, 12)[1:-1, 1:-1]
    np.testing.assert_allclose(ga, gb, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# properties (pure-NumPy warp math — no Spark session needed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    data=st.lists(
        st.lists(
            st.one_of(
                st.floats(-1e4, 1e4, allow_nan=False), st.just(-9999.0)
            ),
            min_size=4, max_size=4,
        ),
        min_size=3, max_size=3,
    ),
    resampling=st.sampled_from(["bilinear", "nearest"]),
)
@settings(max_examples=60, deadline=None)
def test_warp_identity_property(data, resampling):
    """Warping any raster onto ITS OWN grid is the identity on valid
    pixels and maps nodata to dst_nodata — for both resamplings, any
    mix of valid/nodata values."""
    src = np.array(data, dtype=np.float64)
    out = _numpy_warp(src, SRC_T, SRC_T, src.shape, resampling,
                      -9999.0, np.nan)
    valid = src != -9999.0
    np.testing.assert_allclose(out[valid], src[valid], rtol=1e-12)
    assert np.isnan(out[~valid]).all()


@given(
    data=st.lists(
        st.lists(st.floats(0, 1e4, allow_nan=False), min_size=5, max_size=5),
        min_size=5, max_size=5,
    ),
    ox=st.floats(-1.5, 1.5),
    oy=st.floats(-1.5, 1.5),
)
@settings(max_examples=60, deadline=None)
def test_warp_bilinear_bounds_property(data, ox, oy):
    """Bilinear output on an all-valid raster is a convex combination of
    source pixels: every finite output value lies within [src.min(),
    src.max()] for any destination grid offset."""
    src = np.array(data, dtype=np.float64)
    dst_t = [1.0, 0.0, 10.0 + ox, 0.0, -1.0, 20.0 + oy]
    out = _numpy_warp(src, SRC_T, dst_t, (5, 5), "bilinear", None, np.nan)
    finite = out[~np.isnan(out)]
    if finite.size:
        assert finite.min() >= src.min() - 1e-9
        assert finite.max() <= src.max() + 1e-9


class TestWebMercatorPair:
    """The closed-form EPSG:4326 ↔ EPSG:3857 path of the NumPy engine —
    the one cross-CRS pair that needs no projection database."""

    def test_roundtrip_identity(self):
        from bloomy_etl_spark.operators.raster import (
            _lonlat_to_mercator,
            _mercator_to_lonlat,
        )

        lon = np.linspace(-179.0, 179.0, 37)
        lat = np.linspace(-84.0, 84.0, 37)
        x, y = _lonlat_to_mercator(lon, lat)
        lon2, lat2 = _mercator_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-9)

    def test_published_corner_values(self):
        from bloomy_etl_spark.operators.raster import _lonlat_to_mercator

        x, y = _lonlat_to_mercator(np.array([0.0, 180.0]),
                                   np.array([0.0, 85.05112877980659]))
        assert x[0] == 0.0 and y[0] == pytest.approx(0.0, abs=1e-6)
        # the Web-Mercator square: x(180°) == y(85.0511°) == π·R
        assert x[1] == pytest.approx(20037508.342789244, abs=1e-3)
        assert y[1] == pytest.approx(20037508.342789244, abs=1e-3)

    def test_unsupported_pair_returns_none(self):
        from bloomy_etl_spark.operators.raster import numpy_crs_transform

        assert numpy_crs_transform("EPSG:3857", "EPSG:32633") is None
        assert numpy_crs_transform("EPSG:4326", "EPSG:4326")(1.0, 2.0) == (1.0, 2.0)

    def test_cross_crs_nearest_hits_exact_centers(self, spark):
        """A 4326 source row warped to a 3857 grid whose pixel centers
        map EXACTLY onto source pixel centers: nearest must reproduce
        the source values verbatim."""
        from bloomy_etl_spark.operators.raster import _lonlat_to_mercator

        vals = np.array([[3.0, 7.0, 11.0, 19.0]])
        lat0 = 40.0
        # source: 1°-pixels, centers at lon 10.5..13.5, lat 40 center
        src_t = [1.0, 0.0, 10.0, 0.0, -1.0, lat0 + 0.5]
        step = _lonlat_to_mercator(np.array([1.0]), np.array([0.0]))[0][0] \
            - _lonlat_to_mercator(np.array([0.0]), np.array([0.0]))[0][0]
        x0 = _lonlat_to_mercator(np.array([10.5]), np.array([0.0]))[0][0]
        y0 = _lonlat_to_mercator(np.array([0.0]), np.array([lat0]))[1][0]
        # dst: pixel centers at x0 + k·step (k=0..3), one row centered y0
        dst_t = [step, 0.0, x0 - 0.5 * step, 0.0, -1.0, y0 + 0.5]
        tiles = _tile_df(spark, vals, transform=src_t, crs="EPSG:4326")
        out = warp_to_grid(tiles, dst_t, 4, 1, dst_crs="EPSG:3857",
                           resampling="nearest", engine="numpy").collect()[0]
        np.testing.assert_allclose(
            np.array(out["data"]).reshape(1, 4), vals, atol=1e-9)
        assert out["n_valid"] == 4 and out["crs"] == "EPSG:3857"

    def test_cross_crs_bilinear_midpoint_average(self, spark):
        """dst center exactly halfway (in lon) between two source
        centers, on the source row's center latitude: bilinear = mean
        of the two neighbors."""
        from bloomy_etl_spark.operators.raster import _lonlat_to_mercator

        vals = np.array([[10.0, 30.0]])
        lat0 = -13.0
        src_t = [1.0, 0.0, 0.0, 0.0, -1.0, lat0 + 0.5]  # centers lon .5, 1.5
        xm = _lonlat_to_mercator(np.array([1.0]), np.array([0.0]))[0][0]
        ym = _lonlat_to_mercator(np.array([0.0]), np.array([lat0]))[1][0]
        dst_t = [1.0, 0.0, xm - 0.5, 0.0, -1.0, ym + 0.5]  # one 1m pixel at (xm, ym)
        tiles = _tile_df(spark, vals, transform=src_t, crs="EPSG:4326")
        out = warp_to_grid(tiles, dst_t, 1, 1, dst_crs="EPSG:3857",
                           resampling="bilinear", engine="numpy").collect()[0]
        assert out["data"][0] == pytest.approx(20.0, abs=1e-6)

    @pytest.mark.skipif(not _rasterio_available(),
                        reason="rasterio not importable")
    def test_numpy_mercator_matches_rasterio(self, spark):  # pragma: no cover
        rng = np.random.default_rng(5)
        vals = rng.uniform(0, 100, (6, 8))
        src_t = [0.5, 0.0, 3.0, 0.0, -0.5, 45.0]
        dst_t = [40000.0, 0.0, 300000.0, 0.0, -40000.0, 5700000.0]
        tiles = _tile_df(spark, vals, transform=src_t, crs="EPSG:4326")
        a = warp_to_grid(tiles, dst_t, 10, 8, dst_crs="EPSG:3857",
                         engine="numpy").collect()[0]
        b = warp_to_grid(tiles, dst_t, 10, 8, dst_crs="EPSG:3857",
                         engine="rasterio").collect()[0]
        np.testing.assert_allclose(np.array(a["data"]), np.array(b["data"]),
                                   atol=1e-6)
